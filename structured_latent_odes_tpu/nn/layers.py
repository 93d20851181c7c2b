"""Pure-function neural-net building blocks (param pytrees, no module state).

Replaces the reference's torch modules with ``init(key, spec) -> params`` /
``apply(spec, params, x) -> y`` pairs. Specs are hashable static metadata so
apply functions trace cleanly under ``jit``.

Components mirrored from the reference:
- :func:`conv_encoder_*` — ``EncoderCONV`` (/root/reference/models/encoder_conv.py:17-51)
- :func:`mlp_*`          — ``EncoderMLP`` multi-head builder
  (/root/reference/models/encoder_mlp.py:60-167)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from structured_latent_odes_tpu.nn.init import (
    orthogonal,
    small_normal,
    torch_linear_default,
)

Array = jax.Array

# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

_ACTIVATIONS = {
    None: lambda x: x,
    "identity": lambda x: x,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    # clipped exp for scale heads: exp overflow at unlucky seeds NaNs the
    # whole run (observed); e^15 ~ 3e6 is far beyond any useful scale
    "exp": lambda x: jnp.exp(jnp.clip(x, -30.0, 15.0)),
    "softmax": lambda x: jax.nn.softmax(x, axis=-1),
}


def activation(name: Optional[str]):
    try:
        return _ACTIVATIONS[name]
    except KeyError as e:
        raise ValueError(f"unknown activation {name!r}") from e


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------


def linear_init(key: Array, in_dim: int, out_dim: int, *, bias: bool = True, init: str = "torch"):
    if init == "torch":
        W, b = torch_linear_default(key, in_dim, out_dim)
    elif init == "small_normal":
        W, b = small_normal(key, in_dim, out_dim)
    elif init == "orthogonal":
        kw, kb = jax.random.split(key)
        W = orthogonal(kw, (out_dim, in_dim)).T  # torch inits (out,in); store (in,out)
        _, b = torch_linear_default(kb, in_dim, out_dim)
    else:
        raise ValueError(init)
    p = {"W": W}
    if bias:
        p["b"] = b
    return p


def linear_apply(params, x: Array) -> Array:
    y = x @ params["W"]
    if "b" in params:
        y = y + params["b"]
    return y


# ---------------------------------------------------------------------------
# multi-head MLP builder (EncoderMLP equivalent)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MLPSpec:
    """Declarative MLP: ``in_dim -> hidden... -> head(s)``.

    ``out`` may be an int (single head) or a tuple of ints (multi-head,
    mirroring the reference's ``ListOutModule``). ``out_activation`` is a
    single name or a per-head tuple. Hidden layers use N(0, 0.001) init and
    ``activation`` after each (reference parity: encoder_mlp.py:94-115).
    """

    in_dim: int
    hidden: Tuple[int, ...]
    out: Union[int, Tuple[int, ...]]
    activation: str = "softplus"
    out_activation: Union[None, str, Tuple[Optional[str], ...]] = None

    @property
    def heads(self) -> Tuple[int, ...]:
        return (self.out,) if isinstance(self.out, int) else tuple(self.out)

    @property
    def head_activations(self) -> Tuple[Optional[str], ...]:
        oa = self.out_activation
        if oa is None or isinstance(oa, str):
            return (oa,) * len(self.heads)
        return tuple(oa)


def mlp_init(key: Array, spec: MLPSpec):
    params = {"hidden": [], "heads": []}
    sizes = (spec.in_dim,) + spec.hidden
    for i in range(len(spec.hidden)):
        key, sub = jax.random.split(key)
        W, b = small_normal(sub, sizes[i], sizes[i + 1])
        params["hidden"].append({"W": W, "b": b})
    last = sizes[-1]
    for out_dim in spec.heads:
        key, sub = jax.random.split(key)
        W, b = torch_linear_default(sub, last, out_dim)
        params["heads"].append({"W": W, "b": b})
    return params


def mlp_apply(spec: MLPSpec, params, *inputs: Array):
    """Concats inputs on the last dim (ConcatModule), runs hidden+heads.

    Returns a single array for int ``out``, else a tuple of head outputs.
    """
    x = inputs[0] if len(inputs) == 1 else jnp.concatenate(inputs, axis=-1)
    act = activation(spec.activation)
    for layer in params["hidden"]:
        x = act(linear_apply(layer, x))
    outs = tuple(
        activation(a)(linear_apply(head, x))
        for head, a in zip(params["heads"], spec.head_activations)
    )
    return outs[0] if isinstance(spec.out, int) else outs


# ---------------------------------------------------------------------------
# conv encoder (EncoderCONV equivalent)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ConvEncoderSpec:
    n_channels: int
    n_time: int
    n_filters: int = 10
    filter_size: int = 10
    pool_size: int = 5
    hidden_dim: int = 50
    latent_dim: int = 15

    @property
    def n_conv(self) -> int:
        return self.n_time - (self.filter_size - 1)

    @property
    def n_pool(self) -> int:
        return self.n_conv - (self.pool_size - 1)

    @property
    def flat_dim(self) -> int:
        return self.n_pool * self.n_filters


def conv_encoder_init(key: Array, spec: ConvEncoderSpec):
    k_conv, k_convb, k_lin, k_loc, k_scale = jax.random.split(key, 5)
    conv_W = orthogonal(k_conv, (spec.n_filters, spec.n_channels, spec.filter_size))
    fan_in = spec.n_channels * spec.filter_size
    bound = 1.0 / jnp.sqrt(jnp.asarray(float(fan_in)))
    conv_b = jax.random.uniform(k_convb, (spec.n_filters,), minval=-bound, maxval=bound)
    lin = linear_init(k_lin, spec.flat_dim, spec.hidden_dim, init="orthogonal")
    z_loc = linear_init(k_loc, spec.hidden_dim, spec.latent_dim)
    z_scale = linear_init(k_scale, spec.hidden_dim, spec.latent_dim)
    return {"conv_W": conv_W, "conv_b": conv_b, "lin": lin, "z_loc": z_loc, "z_scale": z_scale}


def conv_encoder_apply(spec: ConvEncoderSpec, params, x: Array) -> Tuple[Array, Array]:
    """x: (B, K, T) observations -> (z_loc, z_scale) each (B, latent_dim).

    conv1d -> avgpool(stride 1) -> flatten -> linear -> tanh -> two heads
    (loc linear, scale linear+exp), matching encoder_conv.py:43-51.
    """
    # Conv1d: NCH x OIH -> NCH
    y = lax.conv_general_dilated(
        x,
        params["conv_W"],
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    y = y + params["conv_b"][None, :, None]
    # AvgPool1d(pool_size, stride=1)
    y = lax.reduce_window(
        y,
        0.0,
        lax.add,
        window_dimensions=(1, 1, spec.pool_size),
        window_strides=(1, 1, 1),
        padding="VALID",
    ) / float(spec.pool_size)
    y = y.reshape(y.shape[0], -1)  # (B, F * n_pool), filter-major like torch .view
    h = jnp.tanh(linear_apply(params["lin"], y))
    z_loc = linear_apply(params["z_loc"], h)
    z_scale = jnp.exp(jnp.clip(linear_apply(params["z_scale"], h), -30.0, 15.0))
    return z_loc, z_scale
