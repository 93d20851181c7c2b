"""The neural ODE decoder core (reference ``OdeModel``/``Dynamics``,
/root/reference/models/blackbox_ode.py:7-109) re-designed TPU-first.

Structure (matching the reference exactly):

- ``latent_to_ode_net``: Linear(L, H) -> ReLU -> Linear(H, D) -> Sigmoid maps
  latent z to the initial state x0.
- ``Dynamics``: a *shared* hidden layer on ``[t, z]`` (time prepended) feeding
  two sigmoid heads — production ``a`` (xavier gain 0.5) and degradation ``d``
  (xavier gain 1.0) — with RHS ``dx/dt = a(t,z) - d(t,z) * x``.

TPU re-design: because the nets never see the state, the hidden layer's
z-projection is computed ONCE per batch and the time contribution is a rank-1
broadcast; all stage-time head evaluations collapse into one batched MXU
matmul, and the state recurrence is solved by a parallel affine scan
(see structured_latent_odes_tpu.ode.semilinear). A generic sequential
``lax.scan`` path and a continuous-adjoint path are kept for parity testing
and arbitrary-dynamics extensions.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from structured_latent_odes_tpu.nn.init import torch_linear_default, xavier_uniform
from structured_latent_odes_tpu.nn.layers import linear_apply
from structured_latent_odes_tpu.ode import odeint, odeint_adjoint, solve_semilinear

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class OdeModelSpec:
    latent_dim: int
    ode_state_dim: int
    ode_hidden_dim: int
    solver: str = "midpoint"
    # 'semilinear' (parallel affine scan, default), 'semilinear_seq',
    # 'semilinear_pallas', 'semilinear_fused' (whole-solve Pallas kernel:
    # stage evals + affine extraction + scan fused, ops/fused_step.py),
    # 'semilinear_auto' (shape-based assoc/pallas/fused
    # dispatch at trace time), 'semilinear_timepar' (sequence-parallel over
    # the mesh's time axis — requires parallel.timepar.time_sharding context),
    # 'generic' (sequential RK on the full RHS),
    # 'adjoint' (generic forward + continuous adjoint backward),
    # 'adaptive' (dopri5, batchwide error control), 'adaptive_per_sample'
    # (dopri5, per-trajectory step schedules) — the full torchdiffeq
    # ``method`` menu (blackbox_ode.py:41-45) reachable from training.
    backend: str = "semilinear"
    rtol: float = 1e-6
    atol: float = 1e-8
    # physical-width multiplier for the 'semilinear_auto' dispatch: vmapped
    # axes (ELBO particles, ensemble members) are invisible in the traced
    # shape, so the per-trace lane count under-reports the physical width by
    # this factor (zoo.py folds in num_particles; sweep.py the member count)
    auto_width_mult: int = 1


def ode_model_init(key: Array, spec: OdeModelSpec):
    L, D, H = spec.latent_dim, spec.ode_state_dim, spec.ode_hidden_dim
    keys = jax.random.split(key, 8)
    # latent -> x0 net (torch default inits)
    l1_W, l1_b = torch_linear_default(keys[0], L, H)
    l2_W, l2_b = torch_linear_default(keys[1], H, D)
    # dynamics: shared hidden on [t, z] (time first), xavier weights + torch biases
    dyn_W = xavier_uniform(keys[2], L + 1, H, gain=1.0)
    _, dyn_b = torch_linear_default(keys[5], L + 1, H)
    prod_W = xavier_uniform(keys[3], H, D, gain=0.5)
    _, prod_b = torch_linear_default(keys[6], H, D)
    degr_W = xavier_uniform(keys[4], H, D, gain=1.0)
    _, degr_b = torch_linear_default(keys[7], H, D)
    return {
        "latent_to_ode": [{"W": l1_W, "b": l1_b}, {"W": l2_W, "b": l2_b}],
        "dyn_hidden": {"W": dyn_W, "b": dyn_b},
        "prod": {"W": prod_W, "b": prod_b},
        "degr": {"W": degr_W, "b": degr_b},
    }


def initialize_state(params, z: Array) -> Array:
    """latent -> x0 via Linear/ReLU/Linear/Sigmoid (blackbox_ode.py:19-22,32-34)."""
    h = jax.nn.relu(linear_apply(params["latent_to_ode"][0], z))
    return jax.nn.sigmoid(linear_apply(params["latent_to_ode"][1], h))


def dynamics_prod_degr(params, t: Array, z: Array) -> Tuple[Array, Array]:
    """Evaluate (a, d) at scalar-or-array times t for latent batch z.

    t: any shape ``S_shape``; z: (B, L). Returns (a, d) of shape
    ``(B, *S_shape, D)``. The hidden layer input is ``[t, z]`` with time first
    (blackbox_ode.py:99-101), so row 0 of the hidden kernel is the time weight.
    """
    W, b = params["dyn_hidden"]["W"], params["dyn_hidden"]["b"]
    z_proj = z @ W[1:] + b  # (B, H)
    t = jnp.asarray(t)
    t_term = t[..., None] * W[0]  # (*S, H)
    S_ndim = t.ndim
    h = jax.nn.relu(z_proj.reshape(z.shape[0], *([1] * S_ndim), -1) + t_term[None])
    a = jax.nn.sigmoid(h @ params["prod"]["W"] + params["prod"]["b"])
    d = jax.nn.sigmoid(h @ params["degr"]["W"] + params["degr"]["b"])
    return a, d


def dynamics_rhs(params, t: Array, x: Array, z: Array) -> Array:
    """Full RHS ``dx/dt = a(t,z) - d(t,z) x`` for the generic solver path."""
    a, d = dynamics_prod_degr(params, t, z)
    return a - d * x


def dynamics_rhs_per_sample_time(params, t: Array, x: Array, z: Array) -> Array:
    """RHS with PER-SAMPLE times ``t: (B, 1)`` aligned to ``z: (B, L)`` — the
    signature odeint_adaptive_per_sample drives (each trajectory sits at its
    own clock)."""
    W, b = params["dyn_hidden"]["W"], params["dyn_hidden"]["b"]
    h = jax.nn.relu(z @ W[1:] + b + t * W[0])  # (B, H)
    a = jax.nn.sigmoid(h @ params["prod"]["W"] + params["prod"]["b"])
    d = jax.nn.sigmoid(h @ params["degr"]["W"] + params["degr"]["b"])
    return a - d * x


# Third 'semilinear_auto' tier (measured, scripts/measure_ensemble_scaling.py
# + the fused table in docs/PERFORMANCE.md): past ~16k concurrent trajectories
# the whole-solve fused kernel beats even the Pallas affine scan (13.6k vs
# 12.8k member-steps/s at S=128 x B=128 on v5e) because it never materializes
# the (B, T-1, S, H) stage tensor; between semilinear._PALLAS_MIN_LANES and
# this bound the Pallas scan wins, below that the associative scan. Same lane
# unit as _PALLAS_MIN_LANES (flattened batch x state elements, physical
# vmapped width folded in); the 64k value sits between the measured S=64
# (pallas ahead, 40,960 lanes) and S=128 (fused ahead, 81,920) points.
_FUSED_MIN_LANES = 65536
_FUSED_SOLVERS = ("euler", "midpoint", "heun", "rk4")


def _auto_picks_fused(spec: OdeModelSpec, z: Array) -> bool:
    """Trace-time choice of the whole-solve fused kernel for 'semilinear_auto'."""
    return (
        jax.default_backend() == "tpu"
        and spec.solver in _FUSED_SOLVERS
        and z.ndim == 2
        and z.shape[0] * spec.ode_state_dim * max(1, int(spec.auto_width_mult))
        >= _FUSED_MIN_LANES
    )


def solve_ode(spec: OdeModelSpec, params, z: Array, ts: Array) -> Array:
    """Integrate from x0(z) over ts. Returns (B, T, D) — batch-major layout
    matching the reference's ``sol.permute(1, 0, 2)`` (blackbox_ode.py:47)."""
    x0 = initialize_state(params, z)
    if spec.backend == "semilinear_timepar":
        # sequence-parallel: dynamics evals + scan sharded over the mesh's
        # time axis (parallel/timepar.py); mesh comes from the ambient
        # time_sharding() context set by the caller of jit/trace
        from structured_latent_odes_tpu.parallel.timepar import (
            get_time_sharding,
            solve_semilinear_timepar,
        )

        ctx = get_time_sharding()
        return solve_semilinear_timepar(
            dynamics_prod_degr,
            params,
            z,
            x0,
            ts,
            method=spec.solver,
            mesh=ctx.mesh,
            time_axis=ctx.time_axis,
            batch_axis=ctx.batch_axis,
        )
    if spec.backend == "semilinear_fused" or (
        spec.backend == "semilinear_auto" and _auto_picks_fused(spec, z)
    ):
        # whole-solve Pallas kernel: stage evals + affine extraction + scan
        # in ONE program, zero HBM intermediates (ops/fused_step.py)
        from structured_latent_odes_tpu.ops.fused_step import fused_semilinear_solve

        return fused_semilinear_solve(params, z, x0, ts, method=spec.solver)
    if spec.backend.startswith("semilinear"):
        backend = {
            "semilinear": "assoc",
            "semilinear_seq": "seq",
            "semilinear_pallas": "pallas",
            "semilinear_auto": "auto",
        }[spec.backend]
        prod_degr = lambda stage_ts: dynamics_prod_degr(params, stage_ts, z)
        return solve_semilinear(
            prod_degr, x0, ts, method=spec.solver, backend=backend,
            width_mult=spec.auto_width_mult,
        )
    if spec.backend == "generic":
        f = lambda t, x: dynamics_rhs(params, t, x, z)
        sol = odeint(f, x0, ts, method=spec.solver)
        return jnp.moveaxis(sol, 0, 1)
    if spec.backend == "adjoint":
        # both params and z must be explicit args so the custom-VJP adjoint
        # propagates gradients to them (closures would block differentiation)
        f = lambda t, x, args: dynamics_rhs(args[0], t, x, args[1])
        sol = odeint_adjoint(f, x0, ts, (params, z), method=spec.solver)
        return jnp.moveaxis(sol, 0, 1)
    if spec.backend in ("adaptive", "adaptive_per_sample"):
        # trainable: adaptive forward + continuous-adjoint backward (the
        # while_loop step control is not reverse-differentiable directly)
        from structured_latent_odes_tpu.ode.adjoint import odeint_adaptive_adjoint
        from structured_latent_odes_tpu.ode.solvers import odeint_adaptive_per_sample

        f = lambda t, x, a: dynamics_rhs(a[0], t, x, a[1])
        forward = None
        if spec.backend == "adaptive_per_sample":
            forward = lambda x0_, a: odeint_adaptive_per_sample(
                lambda t, x: dynamics_rhs_per_sample_time(a[0], t, x, a[1]),
                x0_,
                ts,
                rtol=spec.rtol,
                atol=spec.atol,
            )
        sol = odeint_adaptive_adjoint(
            f, x0, ts, (params, z), rtol=spec.rtol, atol=spec.atol, forward=forward
        )
        return jnp.moveaxis(sol, 0, 1)
    raise ValueError(f"unknown ode backend {spec.backend!r}")
