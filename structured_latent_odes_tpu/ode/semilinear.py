"""Semilinear fast path: parallel-in-time integration of production-degradation
neural dynamics.

The reference's neural ODE (``Dynamics``,
/root/reference/models/blackbox_ode.py:64-109) has the crucial structural
property that the neural network sees only ``[t, z]`` — never the state — and
the state enters the RHS linearly::

    dx/dt = a(t, z) - d(t, z) * x        (elementwise over the state dim)

The reference integrates this with a *sequential* loop of tiny per-step MLP
evaluations (torchdiffeq midpoint: 86 steps x 2 MLP evals, each a (B,26)x(26,25)
matmul). On TPU we re-design the algorithm instead of translating it:

1. **One batched MXU evaluation** of the dynamics net at ALL stage times of
   ALL steps at once — a single ``(B*T*S, H)`` matmul instead of ``2T``
   sequential ones.
2. Any explicit RK step applied to an RHS that is *affine in the state*
   composes to an elementwise **affine map** ``x_{n+1} = A_n * x_n + B_n``.
   We extract ``(A_n, B_n)`` exactly by evaluating the RK update at ``x=0``
   and ``x=1`` (an affine function is determined by two points) — method
   agnostic: works for euler/midpoint/rk4/dopri5 tableaus unchanged.
3. The first-order linear recurrence is solved with
   ``jax.lax.associative_scan`` — a log-depth parallel scan over the time
   axis instead of an O(T) sequential dependency chain.

This produces bitwise-equivalent-to-roundoff trajectories vs. the generic
sequential solver (tested against :func:`structured_latent_odes_tpu.ode.odeint`)
at a fraction of the wall-clock.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from structured_latent_odes_tpu.ode.tableaus import ButcherTableau, get_tableau

Array = jax.Array


def stage_time_grid(ts: Array, tableau: ButcherTableau) -> Array:
    """All RK stage times: shape (T-1, S) where S = number of stages.

    ``stage_ts[n, i] = ts[n] + c_i * (ts[n+1] - ts[n])``.
    """
    ts = jnp.asarray(ts)
    h = ts[1:] - ts[:-1]  # (T-1,)
    c = jnp.asarray(tableau.c, dtype=ts.dtype)  # (S,)
    return ts[:-1, None] + h[:, None] * c[None, :]


def rk_affine_coeffs(
    a_stages: Array,
    d_stages: Array,
    h: Array,
    tableau: ButcherTableau,
) -> Tuple[Array, Array]:
    """Exact per-step affine map (A, B) for ``dx/dt = a(t) - d(t) * x``.

    Args:
      a_stages, d_stages: production/degradation evaluated at stage times,
        shape ``(..., T-1, S, D)`` (any leading batch dims).
      h: step sizes, shape ``(T-1,)`` (broadcast against the arrays).
      tableau: explicit RK tableau.

    Returns:
      (A, B) with shape ``(..., T-1, D)`` such that ``x_{n+1} = A_n x_n + B_n``
      reproduces the RK discretization exactly.

    The RK update is affine in ``x`` because each stage derivative
    ``k_i = a_i - d_i * y_i`` is affine in ``y_i`` which is affine in ``x``.
    We therefore run the (elementwise) RK recurrences twice — once from
    ``x = 0`` giving B, once from ``x = 1`` giving A + B.
    """
    hh = jnp.expand_dims(h, axis=-1)  # (..., T-1, 1) broadcast over D

    def run(x0: Array) -> Array:
        ks = []
        for i, ai_row in enumerate(tableau.a):
            yi = x0
            for aij, kj in zip(ai_row, ks):
                if aij != 0.0:
                    yi = yi + (hh * aij) * kj
            ai = a_stages[..., i, :]
            di = d_stages[..., i, :]
            ks.append(ai - di * yi)
        x1 = x0
        for bi, ki in zip(tableau.b, ks):
            if bi != 0.0:
                x1 = x1 + (hh * bi) * ki
        return x1

    zeros = jnp.zeros_like(a_stages[..., 0, :])
    B = run(zeros)
    A = run(zeros + 1.0) - B
    return A, B


def _affine_combine(left, right):
    """Compose affine maps: (right ∘ left)(x) = A_r (A_l x + B_l) + B_r."""
    a_l, b_l = left
    a_r, b_r = right
    return a_r * a_l, a_r * b_l + b_r


def solve_affine_recurrence(A: Array, B: Array, x0: Array, *, time_axis: int = 0) -> Array:
    """Solve ``x_{n+1} = A_n x_n + B_n`` for all n via parallel prefix scan.

    Args:
      A, B: shape with ``T-1`` along ``time_axis``.
      x0: initial state (shape of A/B without the time axis).

    Returns:
      Trajectory including x0: ``T`` along ``time_axis``.
    """
    pA, pB = lax.associative_scan(_affine_combine, (A, B), axis=time_axis)
    x0e = jnp.expand_dims(x0, time_axis)
    xs = pA * x0e + pB
    return jnp.concatenate([x0e, xs], axis=time_axis)


def solve_affine_sequential(A: Array, B: Array, x0: Array) -> Array:
    """Reference sequential scan (time axis 0) — used for testing/parity."""

    def step(x, ab):
        a, b = ab
        x1 = a * x + b
        return x1, x1

    _, xs = lax.scan(step, x0, (A, B))
    return jnp.concatenate([x0[None], xs], axis=0)


# Auto-backend crossover: the Pallas kernel streams A/B through VMEM once
# (sequential sweep) and wins when the associative scan's O(log T) HBM passes
# dominate — i.e. at large flattened batch*state width M. At small M the
# end-to-end path is layout/dispatch-bound and assoc wins. Crossover measured
# on v5e (scripts/measure_backend_crossover.py; docs/PERFORMANCE.md).
_PALLAS_MIN_LANES = 32768


def _auto_scan_backend(A: Array, width_mult: int = 1) -> str:
    """Pick 'pallas' vs 'assoc' from static shapes at trace time: A has the
    time axis at -2; everything else is elementwise lanes. ``width_mult``
    restores vmapped axes (ELBO particles, ensemble members) that the traced
    shape cannot see — without it the dispatch under-reports the physical
    width by that factor and picks 'assoc' in the HBM-bound regime the
    crossover calibration says 'pallas'."""
    if jax.default_backend() != "tpu":
        return "assoc"
    lanes = (int(np.prod(A.shape)) // A.shape[-2]) * max(1, int(width_mult))
    return "pallas" if lanes >= _PALLAS_MIN_LANES else "assoc"


def solve_semilinear(
    prod_degr_fn: Callable[[Array], Tuple[Array, Array]],
    x0: Array,
    ts: Array,
    method: str = "midpoint",
    *,
    backend: str = "assoc",
    width_mult: int = 1,
) -> Array:
    """Integrate ``dx/dt = a(t) - d(t) x`` with a(t), d(t) given by a function
    of time only (per batch element).

    Args:
      prod_degr_fn: maps stage-time grid ``(T-1, S)`` to ``(a, d)`` arrays of
        shape ``(B, T-1, S, D)`` (or ``(T-1, S, D)`` unbatched).
      x0: initial state ``(B, D)`` (or ``(D,)``).
      ts: output/solution times ``(T,)``.
      backend: 'assoc' (parallel scan), 'seq' (lax.scan), 'pallas' (fused TPU
        kernel from structured_latent_odes_tpu.ops), or 'auto' (shape-based
        trace-time dispatch: pallas in the HBM-bound wide regime, assoc
        otherwise — shapes are static under jit so this costs nothing).
      width_mult: physical-width factor invisible to the traced shape (vmapped
        particle/member axes); only consulted by the 'auto' dispatch.

    Returns:
      Solution with time axis *after* the batch axis: ``(B, T, D)`` — the
      layout the decoder heads consume (matches the reference's
      ``sol.permute(1, 0, 2)``, /root/reference/models/blackbox_ode.py:47).
    """
    tableau = get_tableau(method)
    ts = jnp.asarray(ts, dtype=x0.dtype)
    stage_ts = stage_time_grid(ts, tableau)  # (T-1, S)
    a, d = prod_degr_fn(stage_ts)  # (B, T-1, S, D)
    h = ts[1:] - ts[:-1]
    A, B = rk_affine_coeffs(a, d, h, tableau)  # (B, T-1, D)
    if backend == "auto":
        backend = _auto_scan_backend(A, width_mult)
    if backend == "assoc":
        # scan over the time axis, which sits at -2 for batched inputs
        sol = solve_affine_recurrence(A, B, x0, time_axis=A.ndim - 2)
    elif backend == "seq":
        if A.ndim == 3:  # (B, T-1, D) -> time-major for scan
            At, Bt = jnp.moveaxis(A, 1, 0), jnp.moveaxis(B, 1, 0)
            sol = jnp.moveaxis(solve_affine_sequential(At, Bt, x0), 0, 1)
        else:
            sol = solve_affine_sequential(A, B, x0)
    elif backend == "pallas":
        from structured_latent_odes_tpu.ops.recurrence import affine_scan_pallas

        sol = affine_scan_pallas(A, B, x0)
    else:
        raise ValueError(f"unknown backend {backend!r}")
    return sol
