"""Vmapped multi-run (ensemble/sweep) trainer: S full training runs in ONE jit.

The reference trains strictly one model per process (SURVEY.md §2; its only
parallel artifact is a dormant DataParallel wrapper,
/root/reference/models/encoder_mlp.py:94-96).  These models are ~40k params on
a chip with ~200 GFLOP/s-scale headroom at that size — round 2 measured 0.15%
MFU for a single run.  This module turns that idle silicon into *experiment
throughput*: the ENTIRE training run — every epoch's minibatch scan, the
per-epoch validation ELBO, the best-model selection policy — is one compiled
``lax.scan`` over epochs, ``jax.vmap``-ed over a leading member axis (seeds).
S seeds of a full CVS run cost roughly one run's wall-clock.

Member parity: each member reproduces the sequential CLI driver exactly —
same host-shuffle permutations (``build_epoch_perms`` consumes the member's
``np.random.RandomState(seed)`` exactly like ``data.loader
.stacked_minibatches``), same device key chain (``set_seed`` derivation),
same per-sample draw keying, same selection policy arithmetic
(tests/test_ensemble.py asserts member ≡ sequential run).

Selection policies (each dataset's reference behavior, SURVEY.md §3):

- ``cvs``          best val posterior ELBO × n_losses, ties update
                   (/root/reference/training_cvs.py:325-331)
- ``proc``         best val posterior ELBO, strict; best_epoch is 1-based
                   (/root/reference/training_proc.py:380-388)
- ``proc_heldout`` overwrite every epoch (zero-shot split,
                   /root/reference/training_proc.py:389-393)
- ``challenge``    best mean TRAIN epoch loss, strict
                   (/root/reference/training_challenge.py:368-375)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from structured_latent_odes_tpu.models import elbo_aux, elbo_main
from structured_latent_odes_tpu.models.spec import ModelSpec
from structured_latent_odes_tpu.utils.memo import BoundedMemo
from structured_latent_odes_tpu.train.svi import (
    SVIState,
    make_dual_optimizer,
    make_dual_step,
    shared_adam_init,
    shared_adam_update,
)

Array = jax.Array

POLICIES = ("cvs", "proc", "proc_heldout", "challenge")


class EnsembleRunner(NamedTuple):
    init_state: Any  # (params, key) -> SVIState — identical to the CLI driver's
    run: Any         # the jitted vmapped full-run function (see make_ensemble_runner)
    run_chunk: Any   # (carry, splits, val, perms, mask, aux, lr, epochs) -> (carry, hist)
    refit: Any       # vmapped standalone prior-refit (None when refit_epochs == 0)
    tail_ema: bool = False  # whether the epoch carry tracks a tail-phase EMA


class EnsembleResult(NamedTuple):
    state: Any        # final SVIState, leading member axis
    best_params: Any  # pytree, leading member axis
    best_crit: Array  # (S,)
    best_epoch: Array  # (S,) int32
    history: Dict[str, Array]  # per-epoch per-batch train losses (S, E, nb)
    ema_params: Any = None  # tail-phase EMA pytree (None unless tail_ema_decay>0)


def build_epoch_perms(
    n: int, batch_size: int, num_epochs: int, rng: np.random.RandomState
):
    """Per-epoch shuffle permutations, padded to whole batches.

    Consumes ``rng`` exactly as ``stacked_minibatches`` does (one
    ``rng.shuffle`` per epoch), so member e of an ensemble sees the same
    batch composition as a sequential driver run with the same seed.  The
    epoch loop runs ``num_epochs + 1`` times (the driver's
    ``range(0, num_epochs + 1)``).  Returns (perms (E, nb, B) int32,
    mask (nb, B) float32).
    """
    n_batches = -(-n // batch_size)
    padded = n_batches * batch_size
    E = num_epochs + 1
    perms = np.zeros((E, n_batches, batch_size), dtype=np.int32)
    for e in range(E):
        idx = np.arange(n)
        rng.shuffle(idx)
        sel = np.concatenate([idx, np.zeros(padded - n, dtype=int)])
        perms[e] = sel.reshape(n_batches, batch_size).astype(np.int32)
    mask = np.zeros(padded, dtype=np.float32)
    mask[:n] = 1.0
    return perms, mask.reshape(n_batches, batch_size)


def aux_mult_schedule(config, num_epochs: int) -> np.ndarray:
    """The driver's per-epoch aux multiplier as an (E,) array for the fused
    epoch scan: optional warm-up (aux_mult_start -> base over
    aux_warmup_epochs; lets the conditional prior track the posterior from
    the start — anti-collapse) followed by the optional linear anneal
    (-> aux_mult_final over aux_anneal_epochs). Matches
    ``train.driver._epoch_aux_mult`` pointwise (tested)."""
    from structured_latent_odes_tpu.train.driver import epoch_aux_mult

    base = float(config.aux_loss_multiplier)
    vals = [epoch_aux_mult(config, e) for e in range(num_epochs + 1)]
    return np.asarray(
        [base if v is None else v for v in vals], dtype=np.float32
    )


def lr_scale_schedule(config, num_epochs: int):
    """Per-epoch lr scale array from driver.epoch_lr_scale, or None when the
    decay knobs (lr_final / lr_decay_start) are unset."""
    from structured_latent_odes_tpu.train.driver import epoch_lr_scale

    vals = [epoch_lr_scale(config, e) for e in range(num_epochs + 1)]
    if all(v is None for v in vals):
        return None
    return np.asarray([1.0 if v is None else v for v in vals], dtype=np.float32)


def make_prior_refit_fn(spec: ModelSpec, ts, lr: float):
    """Pure refit function (traceable; used inside the ensemble jit and by
    the standalone :func:`prior_refit` for the sequential CLI drivers):
    R epochs of main-ELBO updates restricted to the 'priors' group, starting
    from the selected best params with fresh Adam slots. The posterior,
    decoder, and aux heads are untouched, so posterior-mode quality is
    bit-identical — only p(z_u|u) catches up to where the posterior settled
    (the round-2/3 diagnosed prior-lag failure)."""
    ts = jnp.asarray(ts)

    def refit(best_params, refit_key, train_split, refit_perms, mask):
        prior_only = {
            group: jax.tree.map(lambda _: group == "priors", best_params[group])
            for group in best_params
        }
        base_mult = jnp.asarray(spec.aux_loss_multiplier, jnp.float32)

        def rstep(carry, xs):
            perm, mask_b = xs  # (B,), (B,) — one minibatch row
            params, slots, key = carry
            key, k1 = jax.random.split(key)
            batch = {k: v[perm] for k, v in train_split.items()}
            batch["mask"] = mask_b
            batch["sample_id"] = perm
            batch["aux_mult"] = base_mult

            def loss_fn(p):
                loss, _ = elbo_main(spec, p, k1, batch, ts)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            params, slots = shared_adam_update(grads, slots, params, prior_only, lr)
            return (params, slots, key), loss

        def repoch(carry, perms_e):
            return jax.lax.scan(rstep, carry, (perms_e, mask))

        carry0 = (best_params, shared_adam_init(best_params), refit_key)
        (params, _, _), _ = jax.lax.scan(repoch, carry0, refit_perms)
        return params

    return refit


def prior_refit(spec: ModelSpec, ts, lr: float, best_params, key, train_split,
                rng: np.random.RandomState, epochs: int, batch_size: int):
    """Standalone prior-refit for the sequential drivers: builds R epochs of
    shuffle perms from ``rng`` and runs the jitted refit in one dispatch."""
    n = train_split["observations"].shape[0]
    refit_perms, mask = build_epoch_perms(n, batch_size, epochs - 1, rng)
    split_dev = {k: jnp.asarray(v) for k, v in train_split.items()}
    fn = jax.jit(make_prior_refit_fn(spec, ts, lr))
    return fn(
        best_params, key, split_dev, jnp.asarray(refit_perms), jnp.asarray(mask)
    )


# Structural memo, mirroring train/svi.py's _TRAIN_STEP_MEMO: a second
# in-process build with equal arguments (sweep resumes, paired
# stacked-vs-shared / sharded-vs-unsharded test runs) returns the SAME
# jitted runner, so identical call shapes reuse the compiled program.
_RUNNER_MEMO = BoundedMemo()


def make_ensemble_runner(
    spec: ModelSpec,
    ts,
    lr: float,
    params_example,
    *,
    policy: str,
    num_particles: int = 1,
    optimizer: str = "shared",
    prior_lr_mult: float = 1.0,
    refit_epochs: int = 0,
    use_lr_sched: bool = False,
    shared_data: bool = False,
    tail_ema_decay: float = 0.0,
    tail_ema_start: int = 0,
):
    """Build the fused multi-member runner.

    Returns ``run(states, eval_keys, train_splits, val_stacks, perms, mask,
    aux_mult) -> EnsembleResult`` where every argument has a leading member
    axis except ``mask`` (padding layout is shape-static across members):

    - states: vmapped SVIState (params/opt/key stacked over S)
    - eval_keys: (S,) typed keys — the driver's ``k_eval`` per member
    - train_splits: dict of (S, N, ...) arrays (observations + labels)
    - val_stacks: dict of (S, nb_v, B_v, ...) stacked val minibatches
      (pass None for policies that never read the val split)
    - perms: (S, E, nb, B) int32, mask: (nb, B) f32, aux_mult: (S, E) f32

    ``shared_data=True`` drops the member axis from ``train_splits`` /
    ``val_stacks`` (pass ONE (N, ...) split / (nb_v, B_v, ...) val stack):
    in a seed sweep every member trains on the same dataset, so stacking S
    copies multiplies the gather-source HBM footprint by S for nothing —
    shared, the per-step minibatch gathers all read one cache-resident
    array. Numerically identical to the stacked layout (tested).

    ``tail_ema_decay > 0`` additionally tracks a TAIL-PHASE EMA of each
    member's params: from epoch ``tail_ema_start`` on, after every epoch,
    ``ema <- decay*ema + (1-decay)*params`` (before that the EMA simply
    tracks params, so activation starts from the current weights). A
    candidate mechanism against CVS per-seed fragility (VERDICT r4 ask #5):
    averaging the decayed tail of the trajectory suppresses the late-phase
    oscillation that makes single snapshots miss the anchors. Costs one
    extra params copy per member and one tree-map per epoch inside the same
    scan; the result carries ``ema_params`` alongside ``best_params`` and
    selection semantics are unchanged (the EMA is recorded for evaluation,
    not silently deployed).

    ``refit_epochs > 0`` appends a PRIOR-REFIT phase (a capability recipe,
    not a reference behavior): starting from each member's selected best
    params, train ONLY the conditional-prior nets on the main ELBO (fresh
    Adam slots, same lr) for R further epochs. The posterior/decoder are
    frozen, so posterior-mode quality is bit-identical; the refit closes the
    diagnosed prior-lag gap (the aux-pressured posterior z_u constellation
    outruns p(z_u|u) during joint training — RESULTS.md round 2/3). The
    ``run`` signature gains a trailing ``refit_perms: (S, R, nb, B)``.
    """
    if policy not in POLICIES:
        raise ValueError(f"unknown policy {policy!r}; one of {POLICIES}")
    if use_lr_sched and optimizer != "shared":
        # fail at build time with the real reason, not a mid-trace TypeError
        raise ValueError(
            "lr schedules (lr_final/lr_decay_start) require optimizer='shared'"
        )
    from structured_latent_odes_tpu.train.svi import _ts_key

    memo_key = (
        spec, _ts_key(ts), float(lr), policy, int(num_particles), optimizer,
        float(prior_lr_mult), int(refit_epochs), bool(use_lr_sched),
        bool(shared_data), float(tail_ema_decay), int(tail_ema_start),
    )
    use_ema = tail_ema_decay > 0.0
    hit = _RUNNER_MEMO.get(memo_key)
    if hit is not None:
        return hit
    ts = jnp.asarray(ts)
    optim = make_dual_optimizer(
        spec, params_example, lr, optimizer, prior_lr_mult=prior_lr_mult
    )
    _step = make_dual_step(spec, ts, optim, num_particles)
    needs_val = policy in ("cvs", "proc")

    def _val_elbo_sums(params, key, val_stack):
        """Σ over val batches of (loss/n) per loss — eval_split's ELBO
        accounting, keyed exactly like the driver: eval_split first splits
        its key into (losses, recon, classify) thirds, then
        evaluate_losses splits once more into (main, aux)."""
        k1, _k2, _k3 = jax.random.split(key, 3)
        ka, kb = jax.random.split(k1)

        def one(carry, batch):
            n = jnp.maximum(jnp.sum(batch["mask"]), 1.0)
            lm, _ = elbo_main(spec, params, ka, batch, ts)
            la = elbo_aux(spec, params, kb, batch)
            return carry, (lm / n, la / n)

        _, (lms, las) = jax.lax.scan(one, None, val_stack)
        return jnp.sum(lms), jnp.sum(las)

    _prior_refit = make_prior_refit_fn(spec, ts, lr)

    def scan_span(
        state: SVIState, eval_key, best_p, best_c, best_e, train_split,
        val_stack, perms, mask, aux_mult, lr_sched, epochs, ema_p=None,
    ):
        """Scan ``epoch_body`` over an arbitrary span of epochs.

        ``epochs`` carries the ABSOLUTE epoch indices of the span, so the
        selection policies record the same ``best_epoch`` whether the full
        run is one dispatch or several chunks (the axon tunnel kills
        single dispatches past ~20k member-epochs — see ``run_chunk``).
        """

        def epoch_body(carry, xs):
            if use_ema:
                state, eval_key, best_p, best_c, best_e, ema = carry
            else:
                state, eval_key, best_p, best_c, best_e = carry
                ema = None
            perm, mult, lr_sc, epoch = xs

            # gather each minibatch INSIDE the step scan (like the refit path)
            # rather than materializing the whole epoch's gathered copy as
            # scan xs — at large member counts the (S, nb*B, ...) epoch copy
            # dominates the per-epoch HBM footprint for zero compute benefit
            def batch_step(state, bxs):
                perm_b, mask_b = bxs
                batch = {k: v[perm_b] for k, v in train_split.items()}
                batch["mask"] = mask_b
                batch["sample_id"] = perm_b
                batch["aux_mult"] = mult
                if use_lr_sched:
                    # only thread the schedule when one is configured — the
                    # split optimizer (which rejects non-float scales) stays
                    # usable
                    batch["lr_scale"] = lr_sc
                return _step(state, batch)

            state, mets = jax.lax.scan(batch_step, state, (perm, mask))

            eval_key, k1, _k2, _k3, _k4 = jax.random.split(eval_key, 5)
            if policy == "cvs":
                lm, la = _val_elbo_sums(state.params, k1, val_stack)
                crit = (lm + la) * 2.0
                improve = crit <= best_c  # driver: best >= crit updates (ties)
                rec_epoch = epoch
            elif policy == "proc":
                lm, la = _val_elbo_sums(state.params, k1, val_stack)
                crit = lm + la
                improve = crit < best_c
                rec_epoch = epoch + 1
            elif policy == "proc_heldout":
                crit = jnp.mean(mets["loss_main"])  # recorded, not selective
                improve = jnp.asarray(True)
                rec_epoch = epoch + 1
            else:  # challenge: mean of the epoch's [main, aux] per-batch losses
                crit = (jnp.mean(mets["loss_main"]) + jnp.mean(mets["loss_aux"])) / 2.0
                improve = crit < best_c
                rec_epoch = epoch

            best_p = jax.tree.map(
                lambda p, b: jnp.where(improve, p, b), state.params, best_p
            )
            best_c = jnp.where(improve, crit, best_c)
            best_e = jnp.where(improve, rec_epoch, best_e).astype(jnp.int32)
            hist_out = {
                "loss_main": mets["loss_main"],
                "loss_aux": mets["loss_aux"],
            }
            if use_ema:
                active = epoch >= tail_ema_start
                d = jnp.float32(tail_ema_decay)
                ema = jax.tree.map(
                    lambda e, p: jnp.where(active, d * e + (1.0 - d) * p, p),
                    ema, state.params,
                )
                return (state, eval_key, best_p, best_c, best_e, ema), hist_out
            return (state, eval_key, best_p, best_c, best_e), hist_out

        carry0 = (state, eval_key, best_p, best_c, best_e)
        if use_ema:
            carry0 = carry0 + (
                ema_p if ema_p is not None
                else jax.tree.map(jnp.asarray, state.params),
            )
        return jax.lax.scan(epoch_body, carry0, (perms, aux_mult, lr_sched, epochs))

    def run_one(
        state: SVIState, eval_key, train_split, val_stack, perms, mask,
        aux_mult, lr_sched, refit_perms=None,
    ):
        E = perms.shape[0]
        carry_f, hist = scan_span(
            state, eval_key,
            jax.tree.map(jnp.asarray, state.params),
            jnp.asarray(jnp.inf), jnp.asarray(0, jnp.int32),
            train_split, val_stack, perms, mask, aux_mult, lr_sched,
            jnp.arange(E, dtype=jnp.int32),
        )
        if use_ema:
            state, eval_key_f, bp, bc, be, ema = carry_f
        else:
            (state, eval_key_f, bp, bc, be), ema = carry_f, None
        if refit_epochs:
            bp = _prior_refit(
                bp, jax.random.fold_in(eval_key_f, 77), train_split, refit_perms, mask
            )
        return EnsembleResult(state, bp, bc, be, hist, ema)

    def chunk_one(
        state, eval_key, best_p, best_c, best_e, train_split, val_stack,
        perms, mask, aux_mult, lr_sched, epochs, ema_p=None,
    ):
        carry, hist = scan_span(
            state, eval_key, best_p, best_c, best_e, train_split, val_stack,
            perms, mask, aux_mult, lr_sched, epochs, ema_p=ema_p,
        )
        return carry, hist

    data_axis = None if shared_data else 0
    val_axis = 0 if (needs_val and not shared_data) else None
    if refit_epochs:
        run = jax.jit(
            jax.vmap(run_one, in_axes=(0, 0, data_axis, val_axis, 0, None, 0, 0, 0))
        )
    else:
        run = jax.jit(
            jax.vmap(
                lambda s, e, t, v, p, m, a, l: run_one(s, e, t, v, p, m, a, l),
                in_axes=(0, 0, data_axis, val_axis, 0, None, 0, 0),
            )
        )

    # chunked dispatch: same epoch_body, explicit best-carry, absolute epoch
    # indices shared across members (in_axes=None)
    chunk_axes = (0, 0, 0, 0, 0, data_axis, val_axis, 0, None, 0, 0, None)
    if use_ema:
        chunk_axes = chunk_axes + (0,)
    run_chunk_v = jax.jit(jax.vmap(chunk_one, in_axes=chunk_axes))

    if refit_epochs:
        refit_v = jax.jit(
            jax.vmap(
                lambda bp, ek, split, rp, m: _prior_refit(
                    bp, jax.random.fold_in(ek, 77), split, rp, m
                ),
                in_axes=(0, 0, data_axis, 0, None),
            )
        )
    else:
        refit_v = None

    def run_chunk_wrapped(
        carry, train_splits, val_stacks, perms, mask, aux_mult, lr_sched,
        epochs,
    ):
        """One chunk of the epoch scan across all members.

        ``carry`` is ``(states, eval_keys, best_p, best_c, best_e)`` — the
        initial carry comes from the caller (params as best_p, +inf crit,
        epoch 0) and the returned carry feeds the next chunk.  Splitting a
        long run into fixed-size chunks is numerically identical to the
        single-dispatch ``run`` (same op sequence; tested) but keeps each
        device execution under the axon-tunnel abort threshold observed at
        ~20k member-epochs (runs/r3/heldout_6000ep_*.log).
        """
        if needs_val and val_stacks is None:
            raise ValueError(f"policy {policy!r} requires val_stacks")
        if not needs_val:
            val_stacks = None
        if lr_sched is None:
            lr_sched = jnp.ones_like(jnp.asarray(aux_mult))
        tail = ()
        if use_ema:
            *head, ema_p = carry
            carry, tail = tuple(head), (ema_p,)
        return run_chunk_v(
            *carry, train_splits, val_stacks, perms, mask, aux_mult,
            lr_sched, jnp.asarray(epochs, jnp.int32), *tail,
        )

    def run_wrapped(
        states, eval_keys, train_splits, val_stacks, perms, mask, aux_mult,
        refit_perms=None, lr_sched=None,
    ):
        if needs_val and val_stacks is None:
            raise ValueError(f"policy {policy!r} requires val_stacks")
        if not needs_val:
            val_stacks = None
        if use_lr_sched and lr_sched is None:
            raise ValueError("runner built with use_lr_sched=True needs lr_sched")
        if lr_sched is None:
            # unread dummy (epoch_body skips it when use_lr_sched=False);
            # keeps the scan xs structure uniform
            lr_sched = jnp.ones_like(jnp.asarray(aux_mult))
        if refit_epochs:
            if refit_perms is None:
                raise ValueError("refit_epochs > 0 requires refit_perms")
            return run(
                states, eval_keys, train_splits, val_stacks, perms, mask,
                aux_mult, lr_sched, refit_perms,
            )
        return run(
            states, eval_keys, train_splits, val_stacks, perms, mask,
            aux_mult, lr_sched,
        )

    def init_state(params, key) -> SVIState:
        return SVIState(params, optim.init(params), key)

    out = EnsembleRunner(
        init_state, run_wrapped, run_chunk_wrapped, refit_v, tail_ema=use_ema
    )
    _RUNNER_MEMO[memo_key] = out
    return out


def run_chunked(
    runner: EnsembleRunner,
    states,
    eval_keys,
    train_splits,
    val_stacks,
    perms,
    mask,
    aux_mult,
    *,
    chunk_epochs: int,
    lr_sched=None,
    refit_perms=None,
    verbose: bool = False,
) -> EnsembleResult:
    """Run the ensemble in fixed-size epoch chunks (multiple dispatches).

    Numerically identical to ``runner.run`` — same epoch_body, the carry
    (state, eval key chain, best params/crit/epoch) threads across chunk
    boundaries — but each device execution stays bounded, which the axon
    tunnel requires for long runs (single dispatches past ~20k member-epochs
    abort with "TPU device error")."""
    S = perms.shape[0]
    E = perms.shape[1]
    carry = (
        states,
        eval_keys,
        states.params,
        jnp.full((S,), jnp.inf, jnp.float32),
        jnp.zeros((S,), jnp.int32),
    )
    if runner.tail_ema:
        carry = carry + (jax.tree.map(jnp.asarray, states.params),)
    hists = []
    for s in range(0, E, chunk_epochs):
        e = min(s + chunk_epochs, E)
        carry, hist = runner.run_chunk(
            carry,
            train_splits,
            val_stacks,
            perms[:, s:e],
            mask,
            aux_mult[:, s:e],
            lr_sched[:, s:e] if lr_sched is not None else None,
            np.arange(s, e),
        )
        jax.block_until_ready(carry[3])
        hists.append(jax.tree.map(np.asarray, hist))
        if verbose:
            print(f"  chunk epochs [{s},{e}) done", flush=True)
    if runner.tail_ema:
        states_f, eval_keys_f, bp, bc, be, ema = carry
    else:
        (states_f, eval_keys_f, bp, bc, be), ema = carry, None
    if runner.refit is not None:
        if refit_perms is None:
            raise ValueError("runner built with refit_epochs needs refit_perms")
        bp = runner.refit(bp, eval_keys_f, train_splits, refit_perms, mask)
    history = {k: np.concatenate([h[k] for h in hists], axis=1) for k in hists[0]}
    return EnsembleResult(states_f, bp, bc, be, history, ema)


def member_mesh(n_devices: Optional[int] = None, n_data: int = 1):
    """``('ens',)`` or 2-D ``('ens', 'data')`` mesh for the ensemble.

    Members never communicate (each is an independent full training run), so
    sharding the leading member axis runs S/n members per device with ZERO
    collectives — the pod-scale layout for sweeps: one chip trains S seeds in
    one jit (vmap), a pod slice trains n×S in the same wall-clock.  The
    reference has no analogue (one model per process,
    /root/reference/training_cvs.py).

    ``n_data > 1`` adds a second mesh axis that shards each member's
    MINIBATCH dimension — the natural pod-slice layout when S alone can't
    fill the slice: every (ens, data) submesh column trains the same member
    on 1/n_data of each batch, XLA inserting the gradient ``psum`` over
    'data' while the member axis stays collective-free.  ``n_devices`` then
    counts the ENS extent (total devices used = n_devices × n_data).

    On this build's single real chip both layouts are no-ops; tests exercise
    them on the virtual 8-device CPU mesh (conftest), and
    ``__graft_entry__.dryrun_multichip`` dry-runs them."""
    devs = jax.devices()
    n = int(n_devices) if n_devices else len(devs) // max(n_data, 1)
    if n * n_data > len(devs):
        raise ValueError(
            f"ensemble mesh {n}x{n_data} > {len(devs)} available devices"
        )
    if n_data > 1:
        grid = np.asarray(devs[: n * n_data]).reshape(n, n_data)
        return jax.sharding.Mesh(grid, ("ens", "data"))
    return jax.sharding.Mesh(np.asarray(devs[:n]), ("ens",))


def shard_member_inputs(mesh, member_trees, replicated_trees=()):
    """``device_put`` runner inputs onto the ``('ens',)`` mesh.

    ``member_trees`` carry a leading member axis on every leaf — sharded
    ``P('ens')``; ``replicated_trees`` (the shared batch mask) are replicated.
    ``None`` entries pass through (optional val_stacks / refit_perms /
    lr_sched).  Pure placement: the jitted vmapped runner sees the same
    values, GSPMD partitions the member axis, and results are numerically
    identical to the unsharded run (tested).  Returns the two groups in
    input order."""
    from jax.sharding import NamedSharding, PartitionSpec

    ens = NamedSharding(mesh, PartitionSpec("ens"))
    rep = NamedSharding(mesh, PartitionSpec())
    n = mesh.devices.size

    def put(tree, sharding):
        if tree is None:
            return None

        def one(x):
            x = jnp.asarray(x)
            if sharding is ens and x.shape[0] % n:
                raise ValueError(
                    f"member axis {x.shape[0]} not divisible by mesh size {n}"
                )
            return jax.device_put(x, sharding)

        return jax.tree.map(one, tree)

    return (
        tuple(put(t, ens) for t in member_trees),
        tuple(put(t, rep) for t in replicated_trees),
    )


def shard_runner_inputs(
    mesh, *, states, eval_keys, train_splits, val_stacks, perms, mask,
    aux_mult, refit_perms=None, lr_sched=None, shared_data=False,
):
    """``device_put`` the full ensemble-runner input set onto a 1-D
    ``('ens',)`` or 2-D ``('ens', 'data')`` mesh (:func:`member_mesh`).

    Layout on the 2-D mesh: every member-axis leaf is ``P('ens', ...)``;
    additionally the MINIBATCH dimension shards over 'data' where it exists —
    ``perms``/``refit_perms`` (S, E, nb, B) as ``P('ens', None, None,
    'data')``, ``val_stacks`` (S, nb_v, B_v, ...) as ``P('ens', None,
    'data')``, the shared ``mask`` (nb, B) as ``P(None, 'data')``.  The
    member's train split stays replicated over 'data' (each column gathers
    its own B/n_data rows locally); params/opt state replicate over 'data',
    so GSPMD derives batch-sharded activations and inserts ONE gradient
    ``psum`` over 'data' per loss — the standard DP decomposition, composed
    with the collective-free member axis.  Pure placement: results are
    numerically equal to the vmapped single-device run up to f32 reduction
    order (dryrun-verified).  Returns the inputs in ``runner.run`` order.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    has_data = "data" in mesh.axis_names
    n_data = mesh.shape["data"] if has_data else 1

    def put(tree, spec):
        if tree is None:
            return None
        sharding = NamedSharding(mesh, spec)

        def one(x):
            x = jnp.asarray(x)
            for dim, name in enumerate(spec):
                if name is None:
                    continue
                extent = mesh.shape[name]
                if x.shape[dim] % extent:
                    raise ValueError(
                        f"axis {dim} ({name}) of shape {x.shape} not divisible "
                        f"by mesh extent {extent}"
                    )
            return jax.device_put(x, sharding)

        return jax.tree.map(one, tree)

    batch_tail = ("data",) if has_data and n_data > 1 else ()
    # shared_data: the split/val stack carry NO member axis (see
    # make_ensemble_runner) — replicate over 'ens', keep the val minibatch
    # dim on 'data'
    split_spec = P() if shared_data else P("ens")
    val_spec = (
        P(None, *batch_tail) if shared_data else P("ens", None, *batch_tail)
    )
    return (
        put(states, P("ens")),
        put(eval_keys, P("ens")),
        put(train_splits, split_spec),
        put(val_stacks, val_spec),
        put(perms, P("ens", None, None, *batch_tail)),
        put(mask, P(None, *batch_tail)),
        put(aux_mult, P("ens")),
        put(refit_perms, P("ens", None, None, *batch_tail)),
        put(lr_sched, P("ens")),
    )


def stack_members(trees):
    """Stack a list of congruent pytrees along a new leading member axis."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *trees)


def member_slice(tree, i: int):
    """Extract member ``i`` from a stacked pytree (host-side convenience)."""
    return jax.tree.map(lambda x: x[i], tree)
