"""Sequence-parallel (time-sharded) ODE solving over the device mesh.

The semilinear fast path (ode/semilinear.py) turns each RK step into an
elementwise affine map ``x_{n+1} = A_n x_n + B_n`` and solves the recurrence
with a log-depth ``associative_scan``. On ONE device that scan is already
parallel-in-time; this module shards the TIME axis itself across the mesh so
that a long-horizon solve splits its FLOPs *and* activation memory over
chips — the TPU-native counterpart of sequence parallelism (the reference,
/root/reference/models/blackbox_ode.py:41-47, integrates strictly
sequentially on one GPU and has no equivalent).

Algorithm (classic blocked prefix scan, three phases):

1. every device runs a LOCAL ``associative_scan`` over its chunk of
   ``(A, B)`` pairs — no communication;
2. the per-device chunk *totals* (one ``(batch, D)`` affine pair each) are
   ``all_gather``-ed over the time axis of the mesh — a tiny collective that
   rides ICI — and every device composes the exclusive prefix of the chunks
   before it;
3. each device applies its carry to its local prefixes. Total comm:
   ``2 * n_time_shards * batch * D`` floats, independent of T.

Padding steps use the identity affine map ``(A=1, B=0)``, so ragged
``T-1 % n_shards != 0`` horizons compose exactly.

Everything is differentiable (the ``all_gather`` transposes to a
``psum_scatter``), so the same path serves training. Composes with data
parallelism: pass ``batch_axis`` to run on a 2-D (data x time) mesh where
the batch is sharded over ``data`` and the horizon over ``time``.
"""

from __future__ import annotations

import contextlib
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from structured_latent_odes_tpu.ode.semilinear import (
    _affine_combine,
    rk_affine_coeffs,
    stage_time_grid,
)
from structured_latent_odes_tpu.ode.tableaus import get_tableau

Array = jax.Array


def _blocked_scan_local(pA: Array, pB: Array, x0: Array, time_axis: str):
    """Phases 2-3 of the blocked scan, given LOCAL inclusive prefixes.

    pA, pB: (B, T_local, D) local inclusive prefix compositions.
    x0: (B, D) state entering the global recurrence (replicated over time
    shards). Returns the local slice of the global trajectory (B, T_local, D).
    """
    gA = lax.all_gather(pA[:, -1], time_axis)  # (n_shards, B, D)
    gB = lax.all_gather(pB[:, -1], time_axis)
    cA, cB = lax.associative_scan(_affine_combine, (gA, gB), axis=0)
    i = lax.axis_index(time_axis)
    j = jnp.maximum(i - 1, 0)
    pre_a = jnp.where(i == 0, jnp.ones_like(x0), cA[j])
    pre_b = jnp.where(i == 0, jnp.zeros_like(x0), cB[j])
    carry = pre_a * x0 + pre_b
    return pA * carry[:, None] + pB


def _pad_steps(A: Array, B: Array, n_shards: int) -> Tuple[Array, Array, int]:
    """Right-pad the time axis (axis 1) to a multiple of n_shards with
    identity affine maps."""
    t = A.shape[1]
    pad = (-t) % n_shards
    if pad:
        shape = (A.shape[0], pad, A.shape[2])
        A = jnp.concatenate([A, jnp.ones(shape, A.dtype)], axis=1)
        B = jnp.concatenate([B, jnp.zeros(shape, B.dtype)], axis=1)
    return A, B, pad


def solve_affine_recurrence_timepar(
    A: Array,
    B: Array,
    x0: Array,
    *,
    mesh: Mesh,
    time_axis: str = "model",
    batch_axis: Optional[str] = None,
) -> Array:
    """Time-sharded solve of ``x_{n+1} = A_n x_n + B_n``.

    A, B: (batch, T-1, D); x0: (batch, D). Returns (batch, T, D) including
    x0, numerically equal to ode.semilinear.solve_affine_recurrence.
    """
    n = mesh.shape[time_axis]
    t = A.shape[1]
    Ap, Bp, pad = _pad_steps(A, B, n)

    def local(a, b, x0):
        pA, pB = lax.associative_scan(_affine_combine, (a, b), axis=1)
        return _blocked_scan_local(pA, pB, x0, time_axis)

    bspec = batch_axis  # None -> replicated batch
    xs = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(bspec, time_axis, None),
            P(bspec, time_axis, None),
            P(bspec, None),
        ),
        out_specs=P(bspec, time_axis, None),
    )(Ap, Bp, x0)
    if pad:
        xs = xs[:, :t]
    return jnp.concatenate([x0[:, None], xs], axis=1)


def solve_semilinear_timepar(
    prod_degr_fn: Callable[[object, Array, Array], Tuple[Array, Array]],
    params,
    z: Array,
    x0: Array,
    ts: Array,
    *,
    method: str = "midpoint",
    mesh: Mesh,
    time_axis: str = "model",
    batch_axis: Optional[str] = None,
) -> Array:
    """FULLY sequence-parallel semilinear solve: the dynamics-net stage
    evaluations, the RK affine-coefficient extraction AND the prefix scan all
    run on local time chunks inside one ``shard_map`` — compute and
    activation memory split ``n_time_shards`` ways, with only the tiny
    chunk-total collective crossing devices.

    prod_degr_fn(params, stage_ts, z) -> (a, d) with shapes
    (batch, n_steps, S, D) for stage_ts (n_steps, S) — i.e.
    nn.ode_model.dynamics_prod_degr. params/z are passed as explicit
    shard_map operands (replicated / batch-sharded), never closed over.

    Returns (batch, T, D) including x0.
    """
    tableau = get_tableau(method)
    ts = jnp.asarray(ts, dtype=x0.dtype)
    t_steps = ts.shape[0] - 1
    n = mesh.shape[time_axis]
    pad = (-t_steps) % n

    stage_ts = stage_time_grid(ts, tableau)  # (T-1, S)
    h = ts[1:] - ts[:-1]
    if pad:
        stage_ts = jnp.concatenate([stage_ts, stage_ts[-1:].repeat(pad, 0)], axis=0)
        h = jnp.concatenate([h, jnp.ones((pad,), h.dtype)], axis=0)
    chunk = (t_steps + pad) // n

    def local(params, z, x0, stage_ts_l, h_l):
        a, d = prod_degr_fn(params, stage_ts_l, z)  # (B, chunk, S, D)
        A, B = rk_affine_coeffs(a, d, h_l, tableau)  # (B, chunk, D)
        if pad:
            gidx = lax.axis_index(time_axis) * chunk + jnp.arange(chunk)
            valid = (gidx < t_steps)[None, :, None]
            A = jnp.where(valid, A, jnp.ones_like(A))
            B = jnp.where(valid, B, jnp.zeros_like(B))
        pA, pB = lax.associative_scan(_affine_combine, (A, B), axis=1)
        return _blocked_scan_local(pA, pB, x0, time_axis)

    bspec = batch_axis
    xs = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(),  # params pytree: replicated (prefix spec)
            P(bspec, None),
            P(bspec, None),
            P(time_axis, None),
            P(time_axis),
        ),
        out_specs=P(bspec, time_axis, None),
    )(params, z, x0, stage_ts, h)
    if pad:
        xs = xs[:, :t_steps]
    return jnp.concatenate([x0[:, None], xs], axis=1)


class TimeShardingContext(NamedTuple):
    mesh: Mesh
    time_axis: str
    batch_axis: Optional[str]


# Plain module-global (NOT thread-local): the unscoped set_time_sharding form
# must be visible to model traces regardless of which thread jit happens to
# trace on. Training is single-process; concurrent *different* contexts in
# one process are unsupported.
_ctx: Optional[TimeShardingContext] = None


def set_time_sharding(
    mesh: Mesh, time_axis: str = "model", batch_axis: Optional[str] = "data"
) -> Optional[TimeShardingContext]:
    """Install the ambient mesh context for the remainder of the process —
    the unscoped form ``train.backend`` uses for a whole training run (every
    later jit trace of the model, including eval/recon, needs it). Returns
    the previous context."""
    global _ctx
    prev = _ctx
    _ctx = TimeShardingContext(mesh, time_axis, batch_axis)
    return prev


def clear_time_sharding() -> Optional[TimeShardingContext]:
    """Remove the ambient mesh context (e.g. at the end of a run installed
    via the unscoped :func:`set_time_sharding`). Returns the previous
    context so callers can restore it if they were nested."""
    global _ctx
    prev = _ctx
    _ctx = None
    return prev


def current_time_sharding() -> Optional[TimeShardingContext]:
    """The ambient context, or None — for identity checks by run managers."""
    return _ctx


@contextlib.contextmanager
def time_sharding(mesh: Mesh, time_axis: str = "model", batch_axis: Optional[str] = "data"):
    """Ambient mesh context consumed by the ``semilinear_timepar`` model
    backend (nn.ode_model.solve_ode): model/trace code deep inside a jitted
    train step has no argument slot for a mesh, so the backend reads it from
    here at trace time."""
    global _ctx
    prev = set_time_sharding(mesh, time_axis, batch_axis)
    try:
        yield
    finally:
        _ctx = prev


def get_time_sharding() -> TimeShardingContext:
    ctx = _ctx
    if ctx is None:
        raise RuntimeError(
            "backend='semilinear_timepar' requires an ambient mesh: wrap the "
            "jit/trace call in parallel.timepar.time_sharding(mesh, ...)"
        )
    return ctx
