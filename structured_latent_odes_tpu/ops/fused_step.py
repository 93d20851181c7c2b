"""Pallas TPU kernel: the ENTIRE semilinear RK solve in one fused kernel.

Motivation (docs/PERFORMANCE.md "The S>32 droop"): the XLA lowering of
``ode/semilinear.py::solve_semilinear`` materializes the stage activation
tensor ``h = relu(z_proj + t*w_t)`` of shape ``(B, T-1, S, H)`` — ~140 MB at
the S=64 ensemble shapes — plus the ``(B, T-1, S, D)`` production/degradation
stage outputs, through HBM in both the forward and backward pass. Once the
per-step working set outgrows VMEM (~16 MB), XLA splits its fusions and
throughput droops (measured: bytes/member-step grows 26% from S=16 to S=64).

This kernel never materializes any of it. Per batch-tile it walks the time
axis ONCE, holding only the ``(H, bt)`` latent projection and the ``(D, bt)``
running state in VMEM:

    for t in 0..T-2:                     # sequential, on-chip
      for each RK stage i (static):      # midpoint: 2, rk4: 4
        h_i = relu(u + tau_{t,i} * w_t)  # rank-1 time update, (H, bt)
        a_i = sigmoid(Wa h_i + ba)       # (D, bt) MXU
        d_i = sigmoid(Wd h_i + bd)
      (A_t, B_t) = affine map of the RK step  # evaluate at x=0 and x=1,
                                              # ode/semilinear.py:57-101
      x_{t+1} = A_t * x_t + B_t          # write one (D, bt) slab

HBM traffic per tile: read ``u`` once + write the ``(T, D, bt)`` trajectory —
the information-theoretic floor for this computation.

The backward pass is a second kernel that re-walks the time axis in reverse
(flash-attention style recomputation): stages are recomputed per step (cheap:
rank-1 + two tiny matmuls), the adjoint ``lam_t = A_t lam_{t+1} + g_t`` runs
as the same linear recurrence in reverse (ops/recurrence.py:19-22), and the
hand-derived VJP through the affine-map extraction (the two RK recurrences)
and the stage heads accumulates weight gradients in VMEM. Residuals saved:
inputs + the forward trajectory only.

Layout is TRANSPOSED relative to the rest of the package: features in
sublanes, batch in lanes — H=25 pads to 32 sublanes and D=5 to 8 instead of
both padding to 128 lanes, an 11x denser VPU occupancy for these tiny-feature
shapes. Transposes at the XLA boundary are one cheap relayout of
inputs/outputs.

Reference provenance: the dynamics structure (shared hidden on [t, z],
sigmoid production/degradation heads, state entering linearly) is
/root/reference/models/blackbox_ode.py:64-109; the reference integrates it
with torchdiffeq midpoint (:41-45). This kernel is that decoder's entire
``solve_ODE`` in one TPU program.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from structured_latent_odes_tpu.ode.tableaus import get_tableau

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _stage_eval(u, wt, wa, ba, wd, bd, tau):
    """One dynamics-net stage at scalar time tau.

    u: (H, bt) latent projection; wt: (H, 1) time weight column.
    Returns (pre, h, a, d): pre-activation, hidden, production, degradation.
    """
    pre = u + tau * wt
    h = jnp.maximum(pre, 0.0)
    a = jax.nn.sigmoid(
        jax.lax.dot_general(
            wa, h, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        + ba
    )
    d = jax.nn.sigmoid(
        jax.lax.dot_general(
            wd, h, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        + bd
    )
    return pre, h, a, d


def _rk_runs(a_st, d_st, hstep, tableau):
    """The two elementwise RK recurrences extracting the step's affine map.

    a_st/d_st: per-stage (D, bt) lists. Returns (A, B, residuals) where
    residuals = (ys0, ks0, ys1, ks1) are the per-run stage states needed by
    the hand-derived backward. Mirrors ode/semilinear.py:82-101.
    """

    def run(x0c):
        ks, ys = [], []
        for i, row in enumerate(tableau.a):
            yi = jnp.full_like(a_st[0], x0c)
            for aij, kj in zip(row, ks):
                if aij != 0.0:
                    yi = yi + (hstep * aij) * kj
            ys.append(yi)
            ks.append(a_st[i] - d_st[i] * yi)
        out = jnp.full_like(a_st[0], x0c)
        for bi, ki in zip(tableau.b, ks):
            if bi != 0.0:
                out = out + (hstep * bi) * ki
        return out, ks, ys

    B_, ks0, ys0 = run(0.0)
    A1, ks1, ys1 = run(1.0)
    return A1 - B_, B_, (ys0, ys1)


def _rk_runs_bwd(d_st, ys_pair, hstep, tableau, dA, dB):
    """VJP of :func:`_rk_runs` onto the per-stage (a, d) outputs.

    With A = run(1) - run(0), B = run(0): d run(1) = dA, d run(0) = dB - dA.
    Within one run (out = x0 + h Σ b_i k_i; k_i = a_i - d_i y_i;
    y_i = x0 + h Σ_j<i a_ij k_j), reverse-accumulate over stages.
    """
    S = len(tableau.b)
    da = [jnp.zeros_like(dA) for _ in range(S)]
    dd = [jnp.zeros_like(dA) for _ in range(S)]
    for dout, ys in ((dA, ys_pair[1]), (dB - dA, ys_pair[0])):
        dks = [dout * (hstep * bi) if bi != 0.0 else jnp.zeros_like(dout)
               for bi in tableau.b]
        for i in reversed(range(S)):
            dk = dks[i]
            da[i] = da[i] + dk
            dd[i] = dd[i] - ys[i] * dk
            dyi = -d_st[i] * dk
            for j, aij in enumerate(tableau.a[i]):
                if aij != 0.0:
                    dks[j] = dks[j] + (hstep * aij) * dyi
    return da, dd


def _fwd_kernel(tableau, sts_ref, hs_ref, u_ref, wt_ref, wa_ref, ba_ref,
                wd_ref, bd_ref, x0_ref, out_ref):
    """out: (T, D_pad, bt) trajectory including x0 at index 0."""
    Tm1 = sts_ref.shape[0]
    u = u_ref[:, :]
    wt = wt_ref[:, :]
    wa = wa_ref[:, :]
    ba = ba_ref[:, :]
    wd = wd_ref[:, :]
    bd = bd_ref[:, :]
    x0 = x0_ref[:, :]
    out_ref[0:1, :, :] = x0[None]

    def body(t, x):
        hstep = hs_ref[t, 0]
        a_st, d_st = [], []
        for i in range(len(tableau.c)):
            _, _, a, d = _stage_eval(u, wt, wa, ba, wd, bd, sts_ref[t, i])
            a_st.append(a)
            d_st.append(d)
        A_, B_, _ = _rk_runs(a_st, d_st, hstep, tableau)
        x_new = A_ * x + B_
        out_ref[pl.ds(t + 1, 1), :, :] = x_new[None]
        return x_new

    jax.lax.fori_loop(0, Tm1, body, x0)


def _bwd_kernel(tableau, sts_ref, hs_ref, u_ref, wt_ref, wa_ref, ba_ref,
                wd_ref, bd_ref, xs_ref, g_ref,
                du_ref, dwt_ref, dwa_ref, dba_ref, dwd_ref, dbd_ref, dx0_ref):
    """Reverse sweep: adjoint recurrence + recomputed stages + weight grads.

    Per-tile partial weight grads land in (1, ...) blocks of per-tile arrays
    (summed over tiles/lanes in XLA afterwards) — no cross-grid-step
    accumulation, which keeps the kernel valid under vmap's added grid dim.
    """
    Tm1 = sts_ref.shape[0]
    u = u_ref[:, :]
    wt = wt_ref[:, :]
    wa = wa_ref[:, :]
    ba = ba_ref[:, :]
    wd = wd_ref[:, :]
    bd = bd_ref[:, :]

    du_ref[:, :] = jnp.zeros(du_ref.shape, du_ref.dtype)
    dwt_ref[:, :, :] = jnp.zeros(dwt_ref.shape, dwt_ref.dtype)
    dwa_ref[:, :, :] = jnp.zeros(dwa_ref.shape, dwa_ref.dtype)
    dba_ref[:, :, :] = jnp.zeros(dba_ref.shape, dba_ref.dtype)
    dwd_ref[:, :, :] = jnp.zeros(dwd_ref.shape, dwd_ref.dtype)
    dbd_ref[:, :, :] = jnp.zeros(dbd_ref.shape, dbd_ref.dtype)

    lam0 = g_ref[pl.ds(Tm1, 1), :, :][0]  # lam_{T-1} = g_{T-1}

    def body(k, lam):
        t = Tm1 - 1 - k  # step t maps x_t -> x_{t+1}; lam == lam_{t+1}
        hstep = hs_ref[t, 0]
        pres, hs_, a_st, d_st, taus = [], [], [], [], []
        for i in range(len(tableau.c)):
            tau = sts_ref[t, i]
            pre, h, a, d = _stage_eval(u, wt, wa, ba, wd, bd, tau)
            pres.append(pre)
            hs_.append(h)
            a_st.append(a)
            d_st.append(d)
            taus.append(tau)
        A_, _, ys_pair = _rk_runs(a_st, d_st, hstep, tableau)
        x_t = xs_ref[pl.ds(t, 1), :, :][0]
        dA = lam * x_t
        dB = lam
        da, dd = _rk_runs_bwd(d_st, ys_pair, hstep, tableau, dA, dB)
        for i in range(len(tableau.c)):
            sa = a_st[i] * (1.0 - a_st[i]) * da[i]  # sigmoid'
            sd = d_st[i] * (1.0 - d_st[i]) * dd[i]
            dwa_ref[0] += jax.lax.dot_general(
                sa, hs_[i], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dwd_ref[0] += jax.lax.dot_general(
                sd, hs_[i], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dba_ref[0] += sa
            dbd_ref[0] += sd
            dh = jax.lax.dot_general(
                wa, sa, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                wd, sd, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dpre = jnp.where(pres[i] > 0.0, dh, 0.0)
            du_ref[:, :] += dpre
            dwt_ref[0] += taus[i] * dpre
        return A_ * lam + g_ref[pl.ds(t, 1), :, :][0]  # lam_t

    lam_final = jax.lax.fori_loop(0, Tm1, body, lam0)
    dx0_ref[:, :] = lam_final


def _tile(M_pad: int) -> int:
    return min(512, M_pad)


def _fwd_call(u_T, wt, wa, ba, wd, bd, x0_T, sts, hs, method, interpret):
    tableau = get_tableau(method)
    H_pad, M_pad = u_T.shape
    D_pad = x0_T.shape[0]
    Tm1 = sts.shape[0]
    bt = _tile(M_pad)
    n_tiles = M_pad // bt
    kern = functools.partial(_fwd_kernel, tableau)
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((Tm1, sts.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Tm1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((H_pad, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((H_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_pad, H_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_pad, H_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_pad, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Tm1 + 1, D_pad, bt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tm1 + 1, D_pad, M_pad), u_T.dtype),
        interpret=interpret,
    )(sts, hs, u_T, wt, wa, ba, wd, bd, x0_T)


def _bwd_call(u_T, wt, wa, ba, wd, bd, xs_T, g_T, sts, hs, method, interpret):
    tableau = get_tableau(method)
    H_pad, M_pad = u_T.shape
    D_pad = xs_T.shape[1]
    Tm1 = sts.shape[0]
    bt = _tile(M_pad)
    n_tiles = M_pad // bt
    kern = functools.partial(_bwd_kernel, tableau)
    f32 = jnp.float32
    outs = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((Tm1, sts.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Tm1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((H_pad, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((H_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_pad, H_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_pad, H_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Tm1 + 1, D_pad, bt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tm1 + 1, D_pad, bt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((H_pad, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H_pad, bt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_pad, H_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_pad, bt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_pad, H_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_pad, bt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D_pad, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H_pad, M_pad), f32),          # du
            jax.ShapeDtypeStruct((n_tiles, H_pad, bt), f32),    # dwt partials
            jax.ShapeDtypeStruct((n_tiles, D_pad, H_pad), f32),  # dWa partials
            jax.ShapeDtypeStruct((n_tiles, D_pad, bt), f32),    # dba partials
            jax.ShapeDtypeStruct((n_tiles, D_pad, H_pad), f32),  # dWd partials
            jax.ShapeDtypeStruct((n_tiles, D_pad, bt), f32),    # dbd partials
            jax.ShapeDtypeStruct((D_pad, M_pad), f32),          # dx0
        ],
        interpret=interpret,
    )(sts, hs, u_T, wt, wa, ba, wd, bd, xs_T, g_T)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _fused_tm(u_T, wt, wa, ba, wd, bd, x0_T, sts, hs, method, interpret):
    return _fwd_call(u_T, wt, wa, ba, wd, bd, x0_T, sts, hs, method, interpret)


def _fused_fwd(u_T, wt, wa, ba, wd, bd, x0_T, sts, hs, method, interpret):
    xs = _fwd_call(u_T, wt, wa, ba, wd, bd, x0_T, sts, hs, method, interpret)
    return xs, (u_T, wt, wa, ba, wd, bd, xs, sts, hs)


def _fused_bwd(method, interpret, res, g):
    u_T, wt, wa, ba, wd, bd, xs, sts, hs = res
    du, dwt_p, dwa_p, dba_p, dwd_p, dbd_p, dx0 = _bwd_call(
        u_T, wt, wa, ba, wd, bd, xs, g, sts, hs, method, interpret
    )
    dwt = jnp.sum(dwt_p, axis=(0, 2))[:, None]          # (H_pad, 1)
    dwa = jnp.sum(dwa_p, axis=0)                        # (D_pad, H_pad)
    dba = jnp.sum(dba_p, axis=(0, 2))[:, None]          # (D_pad, 1)
    dwd = jnp.sum(dwd_p, axis=0)
    dbd = jnp.sum(dbd_p, axis=(0, 2))[:, None]
    return (du, dwt, dwa, dba, dwd, dbd, dx0,
            jnp.zeros_like(sts), jnp.zeros_like(hs))


_fused_tm.defvjp(_fused_fwd, _fused_bwd)


def fused_semilinear_solve(
    params,
    z: Array,
    x0: Array,
    ts: Array,
    method: str = "midpoint",
    *,
    interpret: bool | None = None,
) -> Array:
    """Fused whole-solve entry: natural layouts in, (B, T, D) out.

    params: the OdeModel param dict (nn/ode_model.py::ode_model_init);
    z: (B, L) latents; x0: (B, D) initial state (initialize_state(params, z),
    differentiated by XLA outside this call); ts: (T,) time grid.

    The latent projection ``u = z @ W[1:] + b`` stays in XLA so its VJP
    (into z and the hidden weights) comes for free; the kernel returns du.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    W, b = params["dyn_hidden"]["W"], params["dyn_hidden"]["b"]
    Wa, ba = params["prod"]["W"], params["prod"]["b"]
    Wd, bd = params["degr"]["W"], params["degr"]["b"]
    H = W.shape[1]
    D = Wa.shape[1]
    B = z.shape[0]
    dt = jnp.float32
    u = (z @ W[1:] + b).astype(dt)  # (B, H)

    tableau = get_tableau(method)
    ts = jnp.asarray(ts, dtype=dt)
    hsteps = (ts[1:] - ts[:-1])[:, None]  # (T-1, 1)
    c = jnp.asarray(tableau.c, dtype=dt)
    sts = ts[:-1, None] + hsteps * c[None, :]  # (T-1, S)

    H_pad = _round_up(H, 8)
    D_pad = _round_up(D, 8)
    M_pad = _round_up(B, 128)
    M_pad = _round_up(M_pad, _tile(M_pad))

    def padT(x, rows, cols):  # transpose (B, F) -> (F_pad, M_pad)
        xT = x.T.astype(dt)
        return jnp.pad(xT, ((0, rows - xT.shape[0]), (0, cols - xT.shape[1])))

    u_T = padT(u, H_pad, M_pad)
    x0_T = padT(x0, D_pad, M_pad)
    wt = jnp.pad(W[0].astype(dt)[:, None], ((0, H_pad - H), (0, 0)))
    wa = jnp.pad(Wa.T.astype(dt), ((0, D_pad - D), (0, H_pad - H)))
    ba_c = jnp.pad(ba.astype(dt)[:, None], ((0, D_pad - D), (0, 0)))
    wd = jnp.pad(Wd.T.astype(dt), ((0, D_pad - D), (0, H_pad - H)))
    bd_c = jnp.pad(bd.astype(dt)[:, None], ((0, D_pad - D), (0, 0)))

    xs_T = _fused_tm(u_T, wt, wa, ba_c, wd, bd_c, x0_T, sts, hsteps,
                     method, interpret)  # (T, D_pad, M_pad)
    return jnp.transpose(xs_T[:, :D, :B], (2, 0, 1)).astype(x0.dtype)
