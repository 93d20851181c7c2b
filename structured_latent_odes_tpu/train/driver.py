"""Shared epoch-loop machinery for the three dataset drivers.

Reproduces the reference training skeleton (SURVEY.md §3.1): per-minibatch
dual-SVI steps, per-epoch evaluation of val/train splits under posterior and
prior reconstruction (``input_pred_stats``, /root/reference/training_cvs.py:
43-144), per-dataset early-stopping policies, and the final test evaluation
with the ``.npy`` artifact dump.

TPU-first: all eval batches are padded to a static size so each split reuses
one compiled executable; recon/classifier outputs are gathered on host and
trimmed by the sample mask.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from structured_latent_odes_tpu.data.loader import iter_minibatches, stacked_minibatches
from structured_latent_odes_tpu.models.spec import ModelSpec
from structured_latent_odes_tpu.train import metrics as M

log = logging.getLogger("slode")


@dataclass
class EvalStats:
    elbo: List[float]  # per-loss summed (loss/batch_size per batch)
    l1: float
    label_metrics: Dict[str, float]
    recon: Dict[str, np.ndarray]
    labels: Dict[str, np.ndarray]
    observations: np.ndarray


def _device_batch(batch):
    return {k: jax.device_put(v) for k, v in batch.items()}


def eval_split(
    spec: ModelSpec,
    params,
    key,
    split: Dict[str, np.ndarray],
    eval_fns,
    batch_size: int,
    is_post: bool,
    collect_recon: bool = True,
) -> EvalStats:
    """The ``input_pred_stats`` equivalent: per-loss ELBO, classifier metrics,
    recon outputs concatenated over the split.

    Site keys are split ONCE for the whole split (not per minibatch): combined
    with per-sample RNG keying, every sample's draw depends only on
    (split key, site, sample_id) — so recon outputs and label metrics are
    identical for any eval ``batch_size`` (tested). The summed ELBO keeps the
    reference's sum-of-batch-means accounting, which is batch-size-structured
    by definition.
    """
    evaluate_losses, classify, reconstruct = eval_fns
    k1, k2, k3 = jax.random.split(key, 3)
    elbo = [0.0, 0.0]
    total_l1, size = 0.0, 0
    recon_acc: Dict[str, List[np.ndarray]] = {}
    preds_acc: Dict[str, List[np.ndarray]] = {}
    labels_acc: Dict[str, List[np.ndarray]] = {}
    obs_acc: List[np.ndarray] = []

    for batch in iter_minibatches(split, batch_size, shuffle=False, pad=True):
        b = _device_batch(batch)
        n = int(batch["mask"].sum())
        lm, la = evaluate_losses(params, k1, b)
        elbo[0] += float(lm) / n
        elbo[1] += float(la) / n

        r = reconstruct(params, k2, b, is_post)
        total_l1 += float(r["l1"])
        size += n
        if collect_recon:
            sel = batch["mask"] > 0
            for k in ("mu_50", "mu_75", "mu_25", "solution_xt", "z", "std"):
                recon_acc.setdefault(k, []).append(np.asarray(r[k])[sel])
            obs_acc.append(batch["observations"][sel])
            for label in spec.labels:
                labels_acc.setdefault(label.name, []).append(batch[label.name][sel])

        p = classify(params, k3, b)
        sel = batch["mask"] > 0
        for label in spec.labels:
            preds_acc.setdefault(label.name, []).append(np.asarray(p[label.name])[sel])
            if not collect_recon:
                labels_acc.setdefault(label.name, []).append(batch[label.name][sel])

    labels = {k: np.concatenate(v) for k, v in labels_acc.items()}
    label_metrics = {}
    for label in spec.labels:
        pred = np.concatenate(preds_acc[label.name])
        target = labels[label.name]
        if label.kind == "bernoulli":
            label_metrics[label.name] = M.accuracy(pred, target)
        elif label.kind == "onehot":
            label_metrics[label.name] = M.onehot_accuracy(pred, target)
        else:
            label_metrics[label.name] = M.mse(pred, target)

    return EvalStats(
        elbo=elbo,
        l1=total_l1 / max(size, 1),
        label_metrics=label_metrics,
        recon={k: np.concatenate(v) for k, v in recon_acc.items()} if recon_acc else {},
        labels=labels,
        observations=np.concatenate(obs_acc) if obs_acc else np.zeros(0),
    )


def epoch_aux_mult(config, epoch: int):
    """Optional aux-site scale schedule (PARITY.md): warm-up
    aux_mult_start -> aux_loss_multiplier over aux_warmup_epochs, then (when
    both are configured, starting AT the end of the warm-up) linear anneal
    base -> aux_mult_final over aux_anneal_epochs. None = the spec constant
    (no schedule configured). Shared by the sequential epoch loop and the
    ensemble trainer (train/ensemble.aux_mult_schedule) so sweep members and
    CLI runs see identical multipliers."""
    base = float(config.aux_loss_multiplier)
    warmup = config.get("aux_warmup_epochs") or 0
    start = config.get("aux_mult_start")
    anneal = config.get("aux_anneal_epochs") or 0
    final = config.get("aux_mult_final")
    has_warmup = bool(warmup) and start is not None
    has_anneal = bool(anneal) and final is not None
    if not has_warmup and not has_anneal:
        return None
    if has_warmup and has_anneal:
        # sequential: ramp start->base over [0, warmup], hold is implicit in
        # the anneal's own start at base, then base->final over the next
        # ``anneal`` epochs. (They used to overlap from epoch 0, so the
        # combined schedule silently never reached ``base``.)
        if epoch <= warmup:
            return float(start) + (base - float(start)) * (epoch / warmup)
        frac = min(1.0, (epoch - warmup) / anneal)
        return float(base * (1 - frac) + float(final) * frac)
    if has_warmup:
        return float(
            float(start) + (base - float(start)) * min(1.0, epoch / warmup)
        )
    frac = min(1.0, epoch / anneal)
    return float(base * (1 - frac) + float(final) * frac)


def epoch_lr_scale(config, epoch: int):
    """Optional late linear lr decay (a recipe the reference lacks):
    constant ``learning_rate`` until ``lr_decay_start``, then linear to
    ``lr_final`` at ``num_epochs``. Returns the SCALE (lr multiplier) or
    None when unconfigured. Shared with the ensemble trainer."""
    final = config.get("lr_final")
    start = config.get("lr_decay_start")
    if final is None or start is None:
        return None
    if epoch <= start:
        return 1.0
    frac = min(1.0, (epoch - start) / max(1, config.num_epochs - start))
    lr = float(config.learning_rate)
    return (lr * (1 - frac) + float(final) * frac) / lr


def _stats_from_fused(spec: ModelSpec, fused) -> EvalStats:
    """EvalStats (without recon payloads) from a fused ``eval_epoch`` result."""
    fused = jax.tree.map(float, fused)
    n = max(fused["n"], 1.0)
    return EvalStats(
        elbo=[fused["elbo_main"], fused["elbo_aux"]],
        l1=fused["l1"] / n,
        label_metrics={k: v / n for k, v in fused["labels"].items()},
        recon={},
        labels={},
        observations=np.zeros(0),
    )


def run_training_epochs(
    *,
    spec: ModelSpec,
    state,
    train_step,
    eval_fns,
    splits: Dict[str, Dict[str, np.ndarray]],
    config,
    rng: np.random.RandomState,
    eval_key,
    select_best: Callable,  # (epoch, val_stats, train_stats, best) -> best'
    on_epoch: Optional[Callable] = None,
    eval_train_stats: bool = True,
    train_epoch: Optional[Callable] = None,
    eval_every: int = 1,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    put_batch: Optional[Callable] = None,
    profile_dir: Optional[str] = None,
    fast_eval: Optional[Callable] = None,
):
    """The shared epoch loop. ``select_best`` implements each dataset's
    (different!) best-model policy; it receives and returns a dict with at
    least {'params', 'epoch', 'criterion'}.

    When ``train_epoch`` is given, all of an epoch's minibatches are stacked
    on host and scanned on device in ONE dispatch (the default drivers do
    this); ``train_step`` remains the per-batch fallback.

    Crash recovery (capability the reference lacks, SURVEY.md §5): with
    ``checkpoint_every``, the FULL training state (params + Adam slots +
    device RNG key + best snapshot + host shuffle-RNG state + eval key) is
    persisted periodically; ``resume`` restores it and continues from the
    saved epoch. Because the host RNG state and both device keys are
    restored, and all model draws are per-sample keyed, a resumed run is
    BATCH-EXACT: it replays the identical shuffles, draws, and updates the
    uninterrupted run would have made (tested in test_train_infra).

    With ``fast_eval`` (a ``svi.make_eval_epoch`` function), the per-epoch
    statistics — including the best-model selection criterion on EVERY
    epoch — run as ONE fused dispatch per (split, mode) over eval batch
    stacks cached on device. The recon-collecting ``eval_split`` host loop
    runs additionally on epochs whose ``on_epoch`` plotting needs the
    arrays (``config.plot_epoch``), with the same RNG keys, but never feeds
    the criterion: selection compares a single numeric path across epochs
    (fused f32 sums), so a plateau tie can't flip on the ~1e-5 relative
    difference between the fused and host-f64 accumulations.
    """
    from structured_latent_odes_tpu.train import checkpoint as ckpt

    put = put_batch or _device_batch
    best = {"params": state.params, "epoch": 0, "criterion": np.inf}
    batch_size = config.mini_batch_size
    t_start = time.time()
    start_epoch = 0

    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        like = {
            "state": state,
            "best_params": state.params,
            "eval_key": eval_key,
            "host_rng": ckpt.host_rng_tree(rng),
        }
        restored = ckpt.restore(checkpoint_path, like)
        meta = ckpt.load_metadata(checkpoint_path)
        state = restored["state"]
        eval_key = restored["eval_key"]
        ckpt.apply_host_rng_tree(rng, restored["host_rng"])
        best = {
            "params": restored["best_params"],
            "epoch": meta["best_epoch"],
            "criterion": meta["criterion"],
        }
        start_epoch = meta["epoch"] + 1
        print(f"resumed from {checkpoint_path} at epoch {start_epoch}")

    def _epoch_aux_mult(epoch: int):
        return epoch_aux_mult(config, epoch)

    # device-resident eval stacks for the fused eval path: built once per
    # split (eval order is never shuffled, so the stack is epoch-invariant)
    _eval_stacks: Dict[str, Dict] = {}

    def _eval_stack(name: str):
        if name not in _eval_stacks:
            _eval_stacks[name] = put(
                stacked_minibatches(splits[name], batch_size, shuffle=False)
            )
        return _eval_stacks[name]

    def _fused_split(params, key, name: str, is_post: bool) -> EvalStats:
        return _stats_from_fused(
            spec, fast_eval(params, key, _eval_stack(name), is_post)
        )

    # trace the SECOND epoch (first is compile-dominated) — or the only
    # epoch when the run is too short to have a second one
    trace_epoch = min(start_epoch + 1, config.num_epochs) if profile_dir else None
    for epoch in range(start_epoch, config.num_epochs + 1):
        aux_mult = _epoch_aux_mult(epoch)
        if epoch == trace_epoch:
            from structured_latent_odes_tpu.utils.profiling import trace as _trace
            profile_ctx = _trace(profile_dir)
        else:
            import contextlib
            profile_ctx = contextlib.nullcontext()
        with profile_ctx:
            if train_epoch is not None:
                batches = stacked_minibatches(
                    splits["train"], batch_size, shuffle=True, rng=rng
                )
                if aux_mult is not None:
                    batches["aux_mult"] = np.full(
                        (batches["mask"].shape[0],), aux_mult, np.float32
                    )
                lr_sc = epoch_lr_scale(config, epoch)
                if lr_sc is not None:
                    batches["lr_scale"] = np.full(
                        (batches["mask"].shape[0],), lr_sc, np.float32
                    )
                state, mets = train_epoch(state, put(batches))
                jax.block_until_ready(mets["loss_main"])
                epoch_losses = np.stack(
                    [np.asarray(mets["loss_main"]), np.asarray(mets["loss_aux"])], axis=1
                ).tolist()
            else:
                epoch_losses = []
                for batch in iter_minibatches(splits["train"], batch_size, shuffle=True, rng=rng):
                    state, mets = train_step(state, put(batch))
                    epoch_losses.append([float(mets["loss_main"]), float(mets["loss_aux"])])

        if eval_every > 1 and epoch % eval_every and epoch != config.num_epochs:
            # fast path: skip the val/train statistics (and best-model
            # update) this epoch — coarser early-stopping granularity
            epoch_mean_loss = float(np.mean(epoch_losses)) if epoch_losses else float("nan")
            line = "[Epoch %d/%d] loss= %.4f  [%.1fs]" % (
                epoch, config.num_epochs, epoch_mean_loss, time.time() - t_start
            )
            print(line)
            log.debug(line)
            continue

        eval_key, k1, k2, k3, k4 = jax.random.split(eval_key, 5)
        # full (recon-collecting) eval only where on_epoch plotting consumes
        # the arrays; everything else takes the fused one-dispatch path
        needs_recon = bool(
            on_epoch is not None
            and config.get("plot_epoch")
            and epoch % config.plot_epoch == 0
            and config.get("plot", True)
        )
        plot_post = plot_prior = None
        if fast_eval is not None:
            # the SELECTION criterion always comes from the fused path, so
            # best-model comparison never mixes the f32 on-device sums with
            # eval_split's host f64 accumulation (the two agree only to
            # ~1e-5 relative — enough to flip a plateau tie across epochs)
            val_post = _fused_split(state.params, k1, "val", True)
            val_prior = _fused_split(state.params, k2, "val", False)
            if eval_train_stats:
                train_post = _fused_split(state.params, k3, "train", True)
                train_prior = _fused_split(state.params, k4, "train", False)
            else:
                train_post = train_prior = val_post
            if needs_recon:
                # plotting additionally needs the recon payloads — same keys
                # as the fused calls, so the drawn reconstructions match the
                # selection eval draw-for-draw
                plot_post = eval_split(
                    spec, state.params, k1, splits["val"], eval_fns, batch_size,
                    is_post=True,
                )
                plot_prior = eval_split(
                    spec, state.params, k2, splits["val"], eval_fns, batch_size,
                    is_post=False,
                )
        else:
            val_post = eval_split(
                spec, state.params, k1, splits["val"], eval_fns, batch_size, is_post=True
            )
            val_prior = eval_split(
                spec, state.params, k2, splits["val"], eval_fns, batch_size, is_post=False
            )
            if eval_train_stats:
                train_post = eval_split(
                    spec, state.params, k3, splits["train"], eval_fns, batch_size, True,
                    collect_recon=False,
                )
                train_prior = eval_split(
                    spec, state.params, k4, splits["train"], eval_fns, batch_size, False,
                    collect_recon=False,
                )
            else:
                train_post = train_prior = val_post

        prev_best = best
        best = select_best(
            epoch,
            {"post": val_post, "prior": val_prior},
            {"post": train_post, "prior": train_prior},
            best,
            state.params,
            epoch_losses,
        )
        improved = "*" if best is not prev_best else ""
        if best is not prev_best:
            # deep-copy: the live state buffers are DONATED to the next
            # train_epoch dispatch; a stored alias would be invalidated
            best = dict(best, params=jax.tree.map(jnp.copy, best["params"]))

        if checkpoint_path and checkpoint_every and epoch % checkpoint_every == 0:
            ckpt.save(
                checkpoint_path,
                {
                    "state": jax.tree.map(jnp.copy, state),
                    "best_params": best["params"],
                    "eval_key": eval_key,
                    "host_rng": ckpt.host_rng_tree(rng),
                },
                metadata={
                    "epoch": epoch,
                    "best_epoch": int(best["epoch"]),
                    "criterion": float(best["criterion"]),
                },
            )

        epoch_mean_loss = float(np.mean(epoch_losses)) if epoch_losses else float("nan")
        metric_str = " ".join(
            "%s=(%.4f,%.4f)" % (name, train_post.label_metrics[name], val_post.label_metrics[name])
            for name in train_post.label_metrics
        )
        line = "[Epoch %d/%d] loss= %.4f  %s l1=(%.6f,%.6f) %s  [%.1fs]" % (
            epoch,
            config.num_epochs,
            epoch_mean_loss,
            metric_str,
            train_post.l1,
            val_post.l1,
            improved,
            time.time() - t_start,
        )
        print(line)
        log.debug(line)

        if on_epoch is not None:
            on_epoch(
                epoch,
                state,
                plot_post if plot_post is not None else val_post,
                plot_prior if plot_prior is not None else val_prior,
                train_post,
                train_prior,
            )

    return state, best


def final_test_eval(
    spec: ModelSpec,
    best_params,
    key,
    split,
    eval_fns,
    batch_size: int,
):
    key, k1, k2 = jax.random.split(key, 3)
    post = eval_split(spec, best_params, k1, split, eval_fns, batch_size, is_post=True)
    prior = eval_split(spec, best_params, k2, split, eval_fns, batch_size, is_post=False)
    return post, prior
