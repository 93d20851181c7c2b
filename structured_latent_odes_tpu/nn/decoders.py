"""Decoder heads over the ODE solution (reference ``Decoder``/
``GaussianDecoder``/``VarianceGaussianDecoder``,
/root/reference/models/decoders.py:6-141).

All decoders integrate the neural ODE once and map the state trajectory to
observation space with bias-free linear heads; the observation scale is a
learnable ``(obs_dim, T)`` ``constant_std`` passed through softplus.
Outputs use the reference layout ``(B, K, T)`` (channels before time).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from structured_latent_odes_tpu.nn.init import torch_linear_default
from structured_latent_odes_tpu.nn.ode_model import (
    OdeModelSpec,
    ode_model_init,
    solve_ode,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DecoderSpec:
    kind: str  # 'quantile' | 'gaussian' | 'variance_gaussian'
    ode: OdeModelSpec
    obs_dim: int
    n_time: int
    constant_std: float = 1e-2


def decoder_init(key: Array, spec: DecoderSpec):
    D, K = spec.ode.ode_state_dim, spec.obs_dim
    keys = jax.random.split(key, 6)
    params: Dict = {"ode": ode_model_init(keys[0], spec.ode)}
    if spec.kind == "quantile":
        for i, name in enumerate(("q50", "q75", "q25")):
            W, _ = torch_linear_default(keys[1 + i], D, K)
            params[name] = {"W": W}  # bias-free heads (decoders.py:27-37)
        params["constant_std"] = jnp.full((K, spec.n_time), spec.constant_std)
    elif spec.kind == "gaussian":
        W, _ = torch_linear_default(keys[1], D, K)
        params["mean"] = {"W": W}
        params["constant_std"] = jnp.full((K, spec.n_time), spec.constant_std)
    elif spec.kind == "variance_gaussian":
        params["std_ode"] = ode_model_init(keys[1], spec.ode)
        W, _ = torch_linear_default(keys[2], D, K)
        params["mean"] = {"W": W}
        W2, _ = torch_linear_default(keys[3], D, K)
        params["std"] = {"W": W2}
        params["constant_std"] = jnp.full((K, spec.n_time), spec.constant_std)
    else:
        raise ValueError(spec.kind)
    return params


def _head(sol: Array, head) -> Array:
    """(B, T, D) @ (D, K) -> (B, K, T): obs-channel-major reference layout."""
    return jnp.swapaxes(sol @ head["W"], -1, -2)


def decoder_apply(spec: DecoderSpec, params, z: Array, ts: Array):
    """Returns, per kind:

    - quantile: ``(solution, mu_75, mu_50, mu_25, std)``
    - gaussian: ``(solution, mean, std)``
    - variance_gaussian: ``(solution, mean, std)`` with std from a second ODE
    """
    sol = solve_ode(spec.ode, params["ode"], z, ts)  # (B, T, D)
    if spec.kind == "quantile":
        mu_50 = _head(sol, params["q50"])
        mu_75 = _head(sol, params["q75"])
        mu_25 = _head(sol, params["q25"])
        std = jnp.broadcast_to(jax.nn.softplus(params["constant_std"]) + 1e-6, mu_50.shape)
        return sol, mu_75, mu_50, mu_25, std
    if spec.kind == "gaussian":
        mean = _head(sol, params["mean"])
        std = jnp.broadcast_to(jax.nn.softplus(params["constant_std"]) + 1e-6, mean.shape)
        return sol, mean, std
    # variance_gaussian: second ODE's trajectory maps to the (raw) std, as in
    # the reference's (never-instantiated) VarianceGaussianDecoder.
    mean = _head(sol, params["mean"])
    sol_std = solve_ode(spec.ode, params["std_ode"], z, ts)
    std = _head(sol_std, params["std"])
    return sol, mean, std
