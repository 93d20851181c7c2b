"""Pallas TPU kernel: fused first-order affine recurrence (linear scan).

Solves ``x_t = A_t * x_{t-1} + B_t`` (elementwise) for the whole trajectory in
ONE kernel. This is the inner loop of the semilinear ODE fast path
(structured_latent_odes_tpu.ode.semilinear): XLA's ``associative_scan``
materializes O(log T) intermediate passes through HBM, while this kernel
streams A/B through VMEM once and keeps the running state on-chip — a single
sequential sweep.

Measured on v5e at (B=65536, T=85, D=8): 30us vs 200us for
``associative_scan`` (6.7x) — the HBM-bound regime it exists for. At small
batches the end-to-end semilinear path is dominated by layout transposes, so
``backend='assoc'`` remains the default there.

Memory layout: time-major (T, M) with the flattened batch*state axis M tiled
into lane-aligned 1024-wide grid cells; each cell's (T, 1024) A/B slabs live
in VMEM (~350 KB at T=86) for the duration of the sweep. The backward pass is
the same kernel on time-reversed coefficients (the adjoint of a linear
recurrence is itself a linear recurrence):

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

_TILE = 1024  # 8 sublanes x 128 lanes


def _scan_kernel(a_ref, b_ref, x0_ref, out_ref):
    """Refs: a/b (T, TILE), x0 (1, TILE), out (T+1, TILE)."""
    T = a_ref.shape[0]
    out_ref[0:1, :] = x0_ref[:, :]

    def body(t, x):
        x_new = a_ref[pl.ds(t, 1), :] * x + b_ref[pl.ds(t, 1), :]
        out_ref[pl.ds(t + 1, 1), :] = x_new
        return x_new

    jax.lax.fori_loop(0, T, body, x0_ref[:, :])


def _affine_scan_raw(A: Array, B: Array, x0: Array, *, interpret: bool) -> Array:
    """A, B: (T, M) time-major flattened; x0: (M,). Returns (T+1, M)."""
    T, M = A.shape
    M_pad = ((M + _TILE - 1) // _TILE) * _TILE
    n_tiles = M_pad // _TILE
    pad = [(0, 0), (0, M_pad - M)]
    a = jnp.pad(A, pad)
    b = jnp.pad(B, pad)
    x0p = jnp.pad(x0, [(0, M_pad - M)]).reshape(1, M_pad)

    out = pl.pallas_call(
        _scan_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((T, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T + 1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T + 1, M_pad), A.dtype),
        interpret=interpret,
    )(a, b, x0p)
    return out[:, :M]


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


def affine_scan_pallas_tm(A_tm: Array, B_tm: Array, x0: Array, *, interpret: bool | None = None) -> Array:
    """Time-major entry: A_tm/B_tm (T, M), x0 (M,) -> trajectory (T+1, M)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _affine_scan_tm(A_tm, B_tm, x0, interpret)


def affine_scan_pallas(A: Array, B: Array, x0: Array, *, interpret: bool | None = None) -> Array:
    """Drop-in replacement for ode.semilinear.solve_affine_recurrence.

    A, B: (Bt, T, D) batched coefficients; x0: (Bt, D).
    Returns the trajectory (Bt, T+1, D) including x0.
    Differentiable (custom VJP). ``interpret=None`` auto-selects interpreter
    mode off-TPU so tests run on CPU.
    """
    if A.ndim == 2:  # unbatched (T, D): lift to a singleton batch
        return affine_scan_pallas(A[None], B[None], x0[None], interpret=interpret)[0]
    Bt, T, D = A.shape
    A_tm = jnp.moveaxis(A, 1, 0).reshape(T, Bt * D)
    B_tm = jnp.moveaxis(B, 1, 0).reshape(T, Bt * D)
    xs = affine_scan_pallas_tm(A_tm, B_tm, x0.reshape(Bt * D), interpret=interpret)
    return jnp.moveaxis(xs.reshape(T + 1, Bt, D), 0, 1)
