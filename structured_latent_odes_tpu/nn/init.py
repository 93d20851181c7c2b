"""Parameter initializers matching the reference's init recipes.

- orthogonal conv/linear init (/root/reference/models/encoder_conv.py:32,37)
- xavier-uniform with gain (Dynamics heads,
  /root/reference/models/blackbox_ode.py:75-82)
- N(0, 0.001) hidden init of the MLP builder
  (/root/reference/models/encoder_mlp.py:97-98)

Weight layout convention: all linear kernels are stored as ``(in, out)`` so
forward passes are ``x @ W + b`` (row-major activations feed the MXU with the
contraction on the last axis).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def orthogonal(key: Array, shape: Sequence[int], dtype=jnp.float32) -> Array:
    """Orthogonal init (torch semantics: rows orthonormal when rows<=cols).

    For >2D shapes, flattens trailing dims (torch.nn.init.orthogonal_).
    """
    rows = shape[0]
    cols = math.prod(shape[1:])  # static host arithmetic: jit-traceable
    n = max(rows, cols)
    a = jax.random.normal(key, (n, n), dtype=jnp.float32)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))
    return q[:rows, :cols].reshape(shape).astype(dtype)


def xavier_uniform(key: Array, fan_in: int, fan_out: int, gain: float = 1.0, dtype=jnp.float32) -> Array:
    """Xavier/Glorot uniform for an ``(in, out)`` kernel."""
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, (fan_in, fan_out), minval=-bound, maxval=bound, dtype=dtype)


def torch_linear_default(key: Array, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch.nn.Linear default: U(-1/sqrt(in), 1/sqrt(in)) for W and b."""
    bound = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    W = jax.random.uniform(kw, (fan_in, fan_out), minval=-bound, maxval=bound, dtype=dtype)
    b = jax.random.uniform(kb, (fan_out,), minval=-bound, maxval=bound, dtype=dtype)
    return W, b


def small_normal(key: Array, fan_in: int, fan_out: int, std: float = 0.001, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    W = jax.random.normal(kw, (fan_in, fan_out), dtype=dtype) * std
    b = jax.random.normal(kb, (fan_out,), dtype=dtype) * std
    return W, b
