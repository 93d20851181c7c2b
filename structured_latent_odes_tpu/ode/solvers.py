"""Batched ODE integrators for TPU (replaces torchdiffeq's ``odeint``).

Design notes (TPU-first):

- Everything is a pure function of ``(f, y0, ts)`` traced once under ``jit``;
  time stepping is a ``lax.scan`` (fixed-step) or a scan-of-while (adaptive),
  never Python loops over traced values.
- States are arrays of arbitrary leading shape (typically ``(B, D)``): the
  whole minibatch integrates in ONE solve, so the dynamics function evaluates
  as large batched matmuls on the MXU instead of per-trajectory solves.
- Gradients: differentiating through the scan is exact
  discretize-then-optimize. ``remat=True`` wraps the step in
  ``jax.checkpoint`` so long horizons trade recompute for HBM.
  ``structured_latent_odes_tpu.ode.adjoint`` provides the O(1)-memory
  continuous adjoint matching ``torchdiffeq.odeint_adjoint`` semantics
  (/root/reference/models/blackbox_ode.py:41-45).

Fixed-step methods take exactly one step per interval of ``ts`` (the
torchdiffeq default grid for fixed solvers), so non-uniform observation grids
(e.g. the synbio plate-reader times) integrate correctly.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from structured_latent_odes_tpu.ode.tableaus import ButcherTableau, get_tableau

Array = jax.Array
ODEFunc = Callable[[Array, Array], Array]  # f(t, y) -> dy/dt


def rk_step(f: ODEFunc, tableau: ButcherTableau, t0: Array, y0: Array, h: Array):
    """One explicit RK step. Returns (y1, f0, y1_err or None, stage derivs ks)."""
    ks = []
    for i, (ci, ai) in enumerate(zip(tableau.c, tableau.a)):
        ti = t0 + ci * h
        yi = y0
        for aij, kj in zip(ai, ks):
            if aij != 0.0:
                yi = yi + (h * aij) * kj
        ks.append(f(ti, yi))
    y1 = y0
    for bi, ki in zip(tableau.b, ks):
        if bi != 0.0:
            y1 = y1 + (h * bi) * ki
    y_err = None
    if tableau.b_err is not None:
        y_err = jnp.zeros_like(y0)
        for bi, ki in zip(tableau.b_err, ks):
            if bi != 0.0:
                y_err = y_err + (h * bi) * ki
    return y1, ks, y_err


def odeint(
    f: ODEFunc,
    y0: Array,
    ts: Array,
    method: str = "midpoint",
    *,
    remat: "bool | str" = False,
    chunk_size: int = 0,
) -> Array:
    """Integrate ``dy/dt = f(t, y)`` and return ``y`` at all times in ``ts``.

    Returns an array of shape ``(len(ts), *y0.shape)`` (time-major, matching
    torchdiffeq).

    Long-horizon memory ("sequence-length scaling", SURVEY.md §5): backprop
    through the scan stores one set of stage activations per step.
    ``remat=True`` checkpoints each step (recompute stages, keep states);
    ``remat='chunked'`` checkpoints sqrt(T)-sized chunks of a nested scan —
    O(sqrt(T)) live activation memory, the discretize-then-optimize
    counterpart of the reference's O(1)-memory continuous adjoint
    (blackbox_ode.py:41-42; exact adjoint lives in ode/adjoint.py).
    """
    tableau = get_tableau(method)
    ts = jnp.asarray(ts, dtype=y0.dtype)

    def step(y, t_pair):
        t0, t1 = t_pair
        y1, _, _ = rk_step(f, tableau, t0, y, t1 - t0)
        return y1, y1

    n_steps = ts.shape[0] - 1
    if remat == "chunked":
        import math

        chunk = chunk_size or max(1, int(math.isqrt(n_steps)))
        n_chunks = -(-n_steps // chunk)
        padded = n_chunks * chunk
        # pad with zero-length steps (t_end -> t_end): identity updates
        t0s = jnp.concatenate([ts[:-1], jnp.full((padded - n_steps,), ts[-1], ts.dtype)])
        t1s = jnp.concatenate([ts[1:], jnp.full((padded - n_steps,), ts[-1], ts.dtype)])
        t_pairs = (t0s.reshape(n_chunks, chunk), t1s.reshape(n_chunks, chunk))

        @jax.checkpoint
        def chunk_scan(y, chunk_pairs):
            y1, ys = lax.scan(step, y, chunk_pairs)
            return y1, ys

        _, ys = lax.scan(chunk_scan, y0, t_pairs)
        ys = ys.reshape((padded,) + y0.shape)[:n_steps]
        return jnp.concatenate([y0[None], ys], axis=0)

    if remat:
        step = jax.checkpoint(step)

    _, ys = lax.scan(step, y0, (ts[:-1], ts[1:]))
    return jnp.concatenate([y0[None], ys], axis=0)


# ---------------------------------------------------------------------------
# Adaptive dopri5 with dense output (torchdiffeq-style error control).
# Batchwide-synchronized step control: the error norm reduces over ALL
# elements (including the batch axis), so one step schedule serves the whole
# batch — compiler-friendly lockstep control flow (cf. PAPERS.md torchode for
# the per-sample alternative).
# ---------------------------------------------------------------------------


def _error_ratio(y_err: Array, y0: Array, y1: Array, rtol: float, atol: float) -> Array:
    tol = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    r = y_err / tol
    return jnp.sqrt(jnp.mean(r * r))


def _initial_step(f: ODEFunc, t0: Array, y0: Array, order: int, rtol: float, atol: float) -> Array:
    f0 = f(t0, y0)
    scale = atol + jnp.abs(y0) * rtol
    d0 = jnp.sqrt(jnp.mean((y0 / scale) ** 2))
    d1 = jnp.sqrt(jnp.mean((f0 / scale) ** 2))
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = y0 + h0 * f0
    f1 = f(t0 + h0, y1)
    d2 = jnp.sqrt(jnp.mean(((f1 - f0) / scale) ** 2)) / h0
    h1 = jnp.where(
        (d1 <= 1e-15) & (d2 <= 1e-15),
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(d1, d2)) ** (1.0 / (order + 1.0)),
    )
    return jnp.minimum(100.0 * h0, h1)


def _interp_fit_dopri(y0: Array, y1: Array, ks, c_mid, h: Array):
    """Fit a quartic polynomial through y0, y1, f0, f1 and the c_mid midpoint."""
    f0, f1 = ks[0], ks[-1]
    y_mid = y0 + h * sum(c * k for c, k in zip(c_mid, ks) if c != 0.0)
    a = 2.0 * h * (f1 - f0) - 8.0 * (y1 + y0) + 16.0 * y_mid
    b = h * (5.0 * f0 - 3.0 * f1) + 18.0 * y0 + 14.0 * y1 - 32.0 * y_mid
    c = h * (f1 - 4.0 * f0) - 11.0 * y0 - 5.0 * y1 + 16.0 * y_mid
    d = h * f0
    e = y0
    return jnp.stack([a, b, c, d, e])


def _interp_eval(coeffs: Array, t0: Array, t1: Array, t: Array) -> Array:
    theta = jnp.clip((t - t0) / (t1 - t0), 0.0, 1.0)
    a, b, c, d, e = coeffs
    return e + theta * (d + theta * (c + theta * (b + theta * a)))


def odeint_adaptive(
    f: ODEFunc,
    y0: Array,
    ts: Array,
    *,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    max_steps: int = 4096,
    safety: float = 0.9,
    ifactor: float = 10.0,
    dfactor: float = 0.2,
) -> Array:
    """Adaptive Dormand-Prince 5(4) with dense output at ``ts``.

    Matches ``torchdiffeq.odeint(..., method='dopri5')`` capability; the
    reference only ever uses fixed ``midpoint`` so this is the capability
    superset used for stiff/long-horizon workloads.
    """
    tableau = get_tableau("dopri5")
    ts = jnp.asarray(ts, dtype=y0.dtype)
    t0 = ts[0]
    h0 = _initial_step(f, t0, y0, tableau.order, rtol, atol)
    init_coeffs = jnp.stack([jnp.zeros_like(y0)] * 4 + [y0])
    # carry: t_prev (step start), y at t_next, t_next (step end), h, coeffs
    init = (t0, y0, t0, h0, init_coeffs)
    order_exp = -1.0 / tableau.order

    def advance_while(carry, target_t):
        def cond(state):
            _, _, t_next, h, _, n = state
            return (t_next < target_t) & (n < max_steps)

        def body(state):
            t_prev, y, t_next, h, coeffs, n = state
            y1, ks, y_err = rk_step(f, tableau, t_next, y, h)
            ratio = _error_ratio(y_err, y, y1, rtol, atol)
            accept = ratio <= 1.0
            factor = jnp.clip(
                safety * jnp.power(jnp.maximum(ratio, 1e-10), order_exp),
                dfactor,
                ifactor,
            )
            h_new = h * factor
            new_coeffs = _interp_fit_dopri(y, y1, ks, tableau.c_mid, h)
            t_prev_n = jnp.where(accept, t_next, t_prev)
            y_n = jnp.where(accept, y1, y)
            t_next_n = jnp.where(accept, t_next + h, t_next)
            coeffs_n = jnp.where(accept, new_coeffs, coeffs)
            return (t_prev_n, y_n, t_next_n, h_new, coeffs_n, n + 1)

        t_prev, y, t_next, h, coeffs = carry
        t_prev, y, t_next, h, coeffs, _ = lax.while_loop(
            cond, body, (t_prev, y, t_next, h, coeffs, 0)
        )
        y_target = jnp.where(
            t_next == t_prev,  # no step taken yet (target_t == t0)
            y,
            _interp_eval(coeffs, t_prev, t_next, target_t),
        )
        return (t_prev, y, t_next, h, coeffs), y_target

    _, ys = lax.scan(advance_while, init, ts[1:])
    return jnp.concatenate([y0[None], ys], axis=0)


def odeint_adaptive_per_sample(
    f: ODEFunc,
    y0: Array,
    ts: Array,
    *,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    max_steps: int = 4096,
    safety: float = 0.9,
    ifactor: float = 10.0,
    dfactor: float = 0.2,
) -> Array:
    """Adaptive dopri5 with PER-SAMPLE step-size control (torchode-style,
    cf. PAPERS.md): each row of the batch follows its own step schedule in
    lockstep SIMD — finished/slow samples are masked, not synchronized.

    ``y0``: (B, D); ``f(t, y)`` must broadcast a per-sample time column
    ``t: (B, 1)`` against ``y: (B, D)``. Use this when trajectories have very
    different stiffness (a shared batchwide step would grind everyone at the
    stiffest sample's pace); for homogeneous batches prefer
    :func:`odeint_adaptive` (fewer flops per step).
    """
    tableau = get_tableau("dopri5")
    ts = jnp.asarray(ts, dtype=y0.dtype)
    B = y0.shape[0]
    t0 = jnp.full((B, 1), ts[0], dtype=y0.dtype)
    # per-sample initial step from the scalar heuristic on each row
    f0 = f(t0, y0)
    scale = atol + jnp.abs(y0) * rtol
    d0 = jnp.sqrt(jnp.mean((y0 / scale) ** 2, axis=1, keepdims=True))
    d1 = jnp.sqrt(jnp.mean((f0 / scale) ** 2, axis=1, keepdims=True))
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    init_coeffs = jnp.stack([jnp.zeros_like(y0)] * 4 + [y0])  # (5, B, D)
    init = (t0, y0, t0, h0, init_coeffs)
    order_exp = -1.0 / tableau.order

    def advance_while(carry, target_t):
        def cond(state):
            _, _, t_next, h, _, n = state
            return jnp.any(t_next[:, 0] < target_t) & (n < max_steps)

        def body(state):
            t_prev, y, t_next, h, coeffs, n = state
            alive = t_next < target_t  # (B, 1)
            y1, ks, y_err = rk_step(f, tableau, t_next, y, h)
            tol = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
            ratio = jnp.sqrt(jnp.mean((y_err / tol) ** 2, axis=1, keepdims=True))
            accept = (ratio <= 1.0) & alive
            factor = jnp.clip(
                safety * jnp.power(jnp.maximum(ratio, 1e-10), order_exp), dfactor, ifactor
            )
            h_new = jnp.where(alive, h * factor, h)
            new_coeffs = _interp_fit_dopri(y, y1, ks, tableau.c_mid, h)
            t_prev_n = jnp.where(accept, t_next, t_prev)
            y_n = jnp.where(accept, y1, y)
            t_next_n = jnp.where(accept, t_next + h, t_next)
            coeffs_n = jnp.where(accept[None], new_coeffs, coeffs)
            return (t_prev_n, y_n, t_next_n, h_new, coeffs_n, n + 1)

        t_prev, y, t_next, h, coeffs = carry
        t_prev, y, t_next, h, coeffs, _ = lax.while_loop(
            cond, body, (t_prev, y, t_next, h, coeffs, 0)
        )
        theta_den = jnp.where(t_next == t_prev, 1.0, t_next - t_prev)
        theta = jnp.clip((target_t - t_prev) / theta_den, 0.0, 1.0)
        a, b, c, d, e = coeffs
        y_interp = e + theta * (d + theta * (c + theta * (b + theta * a)))
        y_target = jnp.where(t_next == t_prev, y, y_interp)
        return (t_prev, y, t_next, h, coeffs), y_target

    _, ys = lax.scan(advance_while, init, ts[1:])
    return jnp.concatenate([y0[None], ys], axis=0)


def solve(
    f: ODEFunc,
    y0: Array,
    ts: Array,
    method: str = "midpoint",
    *,
    adaptive: bool = False,
    adjoint: bool = False,
    remat: bool = False,
    rtol: float = 1e-6,
    atol: float = 1e-8,
) -> Array:
    """Unified front door: fixed-step / adaptive / adjoint-backward solves."""
    if adjoint:
        from structured_latent_odes_tpu.ode.adjoint import odeint_adjoint

        # adapt the 2-arg ODEFunc to the adjoint's f(t, y, args) signature
        return odeint_adjoint(lambda t, y, _: f(t, y), y0, ts, None, method=method)
    if adaptive:
        return odeint_adaptive(f, y0, ts, rtol=rtol, atol=atol)
    return odeint(f, y0, ts, method=method, remat=remat)
