"""Pallas TPU kernel: fused first-order affine recurrence (linear scan).

Solves ``x_t = A_t * x_{t-1} + B_t`` (elementwise) for the whole trajectory in
ONE kernel. This is the inner loop of the semilinear ODE fast path
(structured_latent_odes_tpu.ode.semilinear): XLA's ``associative_scan``
materializes O(log T) intermediate passes through HBM, while this kernel
streams A/B through VMEM once and keeps the running state in registers — a
single sequential sweep at full (8, 128)-tile VPU occupancy.

Measured on v5e: at (B=65536, T=85, D=8) this kernel runs the scan in 30us vs
200us for ``associative_scan`` (6.7x) — the HBM-bound regime it exists for.
At small batches the end-to-end semilinear path is dominated by the
time-major transposes feeding it, so ``backend='assoc'`` remains the default
there (1.3ms vs 1.9ms at B=4096 including the solve).

Memory layout: the flattened batch*state axis is padded to 1024 = 8*128 and
tiled as (tiles, T, 8, 128); the grid runs over tiles (independent lanes).
The backward pass is the same kernel on time-reversed coefficients (the
adjoint of a linear recurrence is itself a linear recurrence):

    lam_{t-1} = A_t * lam_t + g_{t-1};  dA_t = lam_t * x_{t-1};
    dB_t = lam_t;  dx0 = lam_0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_SUB, _LANE = 8, 128
_TILE = _SUB * _LANE


def _scan_kernel(a_ref, b_ref, x0_ref, out_ref):
    """Refs: a/b (1, T, 8, 128), x0 (1, 8, 128), out (1, T+1, 8, 128)."""
    T = a_ref.shape[1]
    out_ref[0, 0] = x0_ref[0]

    def body(t, x):
        x_new = a_ref[0, t] * x + b_ref[0, t]
        out_ref[0, t + 1] = x_new
        return x_new

    jax.lax.fori_loop(0, T, body, x0_ref[0])


def _pack(arr_tm: Array, n_tiles: int) -> Array:
    """(T, M_pad) -> (tiles, T, 8, 128)."""
    T = arr_tm.shape[0]
    return (
        arr_tm.reshape(T, n_tiles, _SUB, _LANE).transpose(1, 0, 2, 3)
    )


def _affine_scan_raw(A: Array, B: Array, x0: Array, *, interpret: bool) -> Array:
    """A, B: (T, M) time-major flattened; x0: (M,). Returns (T+1, M)."""
    T, M = A.shape
    M_pad = ((M + _TILE - 1) // _TILE) * _TILE
    n_tiles = M_pad // _TILE
    pad = [(0, 0), (0, M_pad - M)]
    a = _pack(jnp.pad(A, pad), n_tiles)
    b = _pack(jnp.pad(B, pad), n_tiles)
    x0p = jnp.pad(x0, [(0, M_pad - M)]).reshape(n_tiles, _SUB, _LANE)

    out = pl.pallas_call(
        _scan_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, T, _SUB, _LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, _SUB, _LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, _LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T + 1, _SUB, _LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, T + 1, _SUB, _LANE), A.dtype),
        interpret=interpret,
    )(a, b, x0p)
    return out.transpose(1, 0, 2, 3).reshape(T + 1, M_pad)[:, :M]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _affine_scan_tm(A: Array, B: Array, x0: Array, interpret: bool) -> Array:
    return _affine_scan_raw(A, B, x0, interpret=interpret)


def _fwd(A, B, x0, interpret):
    xs = _affine_scan_raw(A, B, x0, interpret=interpret)
    return xs, (A, xs)


def _bwd(interpret, res, g):
    A, xs = res  # xs: (T+1, M) incl x0; g: (T+1, M)
    # lam_T = g_T; lam_{t-1} = A_t lam_t + g_{t-1}  (t = T..1)
    lam_rev = _affine_scan_raw(A[::-1], g[:-1][::-1], g[-1], interpret=interpret)
    lam = lam_rev[::-1]  # lam[t] = dL/dx_t, t = 0..T
    dA = lam[1:] * xs[:-1]
    dB = lam[1:]
    dx0 = lam[0]
    return dA, dB, dx0


_affine_scan_tm.defvjp(_fwd, _bwd)


def affine_scan_pallas(A: Array, B: Array, x0: Array, *, interpret: bool | None = None) -> Array:
    """Drop-in replacement for ode.semilinear.solve_affine_recurrence.

    A, B: (Bt, T, D) batched coefficients; x0: (Bt, D).
    Returns the trajectory (Bt, T+1, D) including x0.
    Differentiable (custom VJP). ``interpret=None`` auto-selects interpreter
    mode off-TPU so tests run on CPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Bt, T, D = A.shape
    # time-major flatten: (T, Bt*D)
    A_tm = jnp.moveaxis(A, 1, 0).reshape(T, Bt * D)
    B_tm = jnp.moveaxis(B, 1, 0).reshape(T, Bt * D)
    xs = _affine_scan_tm(A_tm, B_tm, x0.reshape(Bt * D), interpret)
    return jnp.moveaxis(xs.reshape(T + 1, Bt, D), 0, 1)
