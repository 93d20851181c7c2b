"""Continuous-adjoint backward pass (O(1)-memory backprop through the solver).

Semantics match ``torchdiffeq.odeint_adjoint`` as used by the reference
(/root/reference/models/blackbox_ode.py:41-42): the forward pass stores only
the solution at the requested output times; the backward pass re-integrates
the augmented adjoint ODE in reverse between consecutive output times with the
same fixed-step method (one RK step per interval, mirroring the forward grid).

Note: for the workloads here, discretize-then-optimize (differentiating the
forward scan, optionally with ``jax.checkpoint``) is usually both faster and
better conditioned on TPU; the adjoint is provided for parity and for very
long horizons where even checkpointed activations do not fit.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree

from structured_latent_odes_tpu.ode.solvers import odeint as _odeint_fixed
from structured_latent_odes_tpu.ode.solvers import odeint_adaptive, rk_step
from structured_latent_odes_tpu.ode.tableaus import get_tableau

Array = jax.Array


def odeint_adjoint(
    f: Callable[[Array, Array, Any], Array],
    y0: Array,
    ts: Array,
    args: Any = None,
    method: str = "midpoint",
) -> Array:
    """Like :func:`odeint` but with a continuous-adjoint custom VJP.

    ``f(t, y, args)`` must be differentiable in ``y`` and ``args``; gradients
    flow to ``y0`` and ``args`` (not to ``ts``).
    """
    tableau = get_tableau(method)

    @jax.custom_vjp
    def _solve(y0: Array, args: Any) -> Array:
        return _odeint_fixed(lambda t, y: f(t, y, args), y0, ts, method=method)

    def _solve_fwd(y0, args):
        ys = _solve(y0, args)
        return ys, (ys, args)

    def _solve_bwd(res, g):
        ys, args = res
        ts_arr = jnp.asarray(ts, dtype=y0.dtype)

        args_flat, unravel_args = ravel_pytree(args)

        def aug_dyn(t, y, a_y, a_flat_unused):
            dy, vjp_fn = jax.vjp(lambda y_, args_: f(t, y_, args_), y, args)
            y_bar, args_bar = vjp_fn(-a_y)  # note the sign: adjoint dynamics
            return dy, y_bar, ravel_pytree(args_bar)[0]

        def interval_bwd(carry, inp):
            a_y, a_args_flat = carry
            t1, t0, y1, g_i = inp  # integrate t1 -> t0 (backwards), add g at t0
            aug0 = (y1, a_y, a_args_flat)
            aug0_flat, unravel_aug = ravel_pytree(aug0)

            def aug_f(t, s_flat):
                y, a_y_, a_af = unravel_aug(s_flat)
                dy, da_y, da_args = aug_dyn(t, y, a_y_, a_af)
                return ravel_pytree((dy, da_y, da_args))[0]

            h = t0 - t1  # negative step
            s1, _, _ = rk_step(aug_f, tableau, t1, aug0_flat, h)
            _, a_y_new, a_args_new = unravel_aug(s1)
            return (a_y_new + g_i, a_args_new), None

        a_y = g[-1]
        a_args_flat = jnp.zeros_like(args_flat)
        T = ys.shape[0]
        inputs = (
            ts_arr[1:][::-1],
            ts_arr[:-1][::-1],
            ys[1:][::-1],
            g[:-1][::-1],
        )
        (a_y, a_args_flat), _ = lax.scan(interval_bwd, (a_y, a_args_flat), inputs)
        return a_y, unravel_args(a_args_flat)

    _solve.defvjp(_solve_fwd, _solve_bwd)
    return _solve(y0, args)


def odeint_adaptive_adjoint(
    f: Callable[[Array, Array, Any], Array],
    y0: Array,
    ts: Array,
    args: Any = None,
    *,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    forward: Callable[[Array, Any], Array] | None = None,
) -> Array:
    """Adaptive (dopri5) forward solve with a continuous-adjoint custom VJP.

    ``lax.while_loop`` step control is not reverse-differentiable, so — like
    ``torchdiffeq.odeint_adjoint`` with an adaptive method — the backward pass
    re-integrates the augmented adjoint ODE between consecutive output times,
    itself adaptively (via the s = -t time reversal so the integration runs
    forward in s). ``forward`` optionally overrides the primal integrator
    (e.g. the per-sample-step variant); it receives ``(y0, args)`` and must
    return the solution at ``ts``.
    """
    ts = jnp.asarray(ts, dtype=y0.dtype)

    @jax.custom_vjp
    def _solve(y0: Array, args: Any) -> Array:
        if forward is not None:
            return forward(y0, args)
        return odeint_adaptive(lambda t, y: f(t, y, args), y0, ts, rtol=rtol, atol=atol)

    def _solve_fwd(y0, args):
        ys = _solve(y0, args)
        return ys, (ys, args)

    def _solve_bwd(res, g):
        ys, args = res
        args_flat, unravel_args = ravel_pytree(args)

        def aug_dyn(t, y, a_y):
            dy, vjp_fn = jax.vjp(lambda y_, args_: f(t, y_, args_), y, args)
            y_bar, args_bar = vjp_fn(-a_y)
            return dy, y_bar, ravel_pytree(args_bar)[0]

        def interval_bwd(carry, inp):
            a_y, a_args_flat = carry
            t1, t0, y1, g_i = inp  # integrate t1 -> t0 (backwards in t)
            aug0 = (y1, a_y, a_args_flat)
            aug0_flat, unravel_aug = ravel_pytree(aug0)

            def aug_f_neg(s, s_flat):  # s = -t runs forward while t runs back
                y, a_y_, _ = unravel_aug(s_flat)
                dy, da_y, da_args = aug_dyn(-s, y, a_y_)
                return -ravel_pytree((dy, da_y, da_args))[0]

            sol = odeint_adaptive(
                aug_f_neg, aug0_flat, jnp.stack([-t1, -t0]), rtol=rtol, atol=atol
            )
            _, a_y_new, a_args_new = unravel_aug(sol[-1])
            return (a_y_new + g_i, a_args_new), None

        a_y = g[-1]
        a_args_flat = jnp.zeros_like(args_flat)
        inputs = (ts[1:][::-1], ts[:-1][::-1], ys[1:][::-1], g[:-1][::-1])
        (a_y, a_args_flat), _ = lax.scan(interval_bwd, (a_y, a_args_flat), inputs)
        return a_y, unravel_args(a_args_flat)

    _solve.defvjp(_solve_fwd, _solve_bwd)
    return _solve(y0, args)
