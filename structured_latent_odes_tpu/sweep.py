"""Multi-seed sweep driver: S full training runs in one jitted dispatch.

Usage::

  python -m structured_latent_odes_tpu.sweep cvs --seeds 12..21 \
      --aux-loss-multiplier 460 --reference-data-dir datasets/cvs_reference \
      --results-root runs/r3/cvs460

  python -m structured_latent_odes_tpu.sweep challenge --seeds 12,13,14 \
      --split 5 --num-epochs 2000 --mini-batch-size 8 \
      --aux-mult-final 46 --aux-anneal-epochs 1000

Each member is an EXACT replica of the corresponding sequential CLI run
(training_{cvs,proc,challenge}.py) at that seed: same dataset build, same
host-shuffle batch composition, same device key chain, same best-model
selection policy (train/ensemble.py; member parity tested in
tests/test_ensemble.py).  The entire ensemble trains inside ONE compiled
``vmap(scan(epochs, scan(batches)))`` — S seeds cost roughly one sequential
run's wall-clock on a single chip (the reference cannot express this at all;
its models leave the chip >99% idle one-at-a-time).

After training, each member's best params get the standard final test
evaluation + ``.npy`` artifact dump into ``<results-root>/seed<seed>/
results_<Model>/`` and the notebook headline metric (eval/metrics.py) is
computed; a ``sweep.json`` summary lands in ``<results-root>``.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from structured_latent_odes_tpu.data.loader import full_batch, stacked_minibatches
from structured_latent_odes_tpu.models import init_params_fast
from structured_latent_odes_tpu.train import artifacts
from structured_latent_odes_tpu.train.driver import final_test_eval
from structured_latent_odes_tpu.train.ensemble import (
    aux_mult_schedule,
    build_epoch_perms,
    lr_scale_schedule,
    make_ensemble_runner,
    run_chunked,
    stack_members,
)
from structured_latent_odes_tpu.train.svi import make_eval_fns
from structured_latent_odes_tpu.utils import set_seed


# ---------------------------------------------------------------------------
# per-dataset member preparation (mirrors each CLI driver's train() preamble)
# ---------------------------------------------------------------------------


def _prep_cvs(cfg):
    from structured_latent_odes_tpu.models import cvs_spec
    from structured_latent_odes_tpu.training_cvs import build_splits

    splits, _ = build_splits(cfg)
    times = np.arange(
        0.0, cfg.seq_len * cfg.delta_t, cfg.delta_t, dtype=np.float32
    )
    return splits, times, cvs_spec(cfg), "cvs", "test"


def _prep_proc(cfg):
    from structured_latent_odes_tpu.data import proc as proc_data
    from structured_latent_odes_tpu.models import proc_spec

    splits, times = proc_data.build_splits(cfg)
    policy = "proc_heldout" if cfg.get("heldout") else "proc"
    return splits, times, proc_spec(cfg, n_time=len(times)), policy, "val"


def _prep_challenge(cfg):
    from structured_latent_odes_tpu.data import challenge as challenge_data
    from structured_latent_odes_tpu.data.loader import normalize_split, to_model_layout
    from structured_latent_odes_tpu.data.transforms import create_transforms
    from structured_latent_odes_tpu.models import challenge_spec

    raw_splits, norm_params, times = challenge_data.build_datasets(cfg)
    transforms = create_transforms(cfg.norm, norm_params)
    splits = {
        name: to_model_layout(normalize_split(split, transforms))
        for name, split in raw_splits.items()
    }
    n_train = splits["train"]["observations"].shape[0]
    cfg.mini_batch_size = min(cfg.mini_batch_size, ((n_train + 7) // 8) * 8)
    return splits, times, challenge_spec(cfg, n_time=len(times)), "challenge", "val"


PREP = {"cvs": _prep_cvs, "proc": _prep_proc, "challenge": _prep_challenge}


def prepare_member(dataset: str, base_config, seed: int) -> Dict:
    """Everything one ensemble member needs, derived exactly as the
    sequential driver derives it at this seed."""
    cfg = base_config.copy()
    cfg.seed = seed
    key = set_seed(seed)
    rng = np.random.RandomState(seed)
    splits, times, spec, policy, test_name = PREP[dataset](cfg)
    key, k_init, k_train, k_eval = jax.random.split(key, 4)
    params = init_params_fast(k_init, spec)
    n_train = splits["train"]["observations"].shape[0]
    perms, mask = build_epoch_perms(n_train, cfg.mini_batch_size, cfg.num_epochs, rng)
    sched = aux_mult_schedule(cfg, cfg.num_epochs)
    lr_sched = lr_scale_schedule(cfg, cfg.num_epochs)
    refit = int(cfg.get("prior_refit_epochs") or 0)
    # refit perms continue the member's host-RNG stream after the main epochs
    # (build_epoch_perms returns num_epochs+1 epochs -> pass refit-1 for R)
    refit_perms = (
        build_epoch_perms(n_train, cfg.mini_batch_size, refit - 1, rng)[0]
        if refit
        else None
    )
    needs_val = policy in ("cvs", "proc")
    val_stack = (
        stacked_minibatches(splits["val"], cfg.mini_batch_size, shuffle=False)
        if needs_val
        else None
    )
    return {
        "seed": seed,
        "config": cfg,
        "splits": splits,
        "times": times,
        "spec": spec,
        "policy": policy,
        "test_name": test_name,
        "params": params,
        "k_train": k_train,
        "k_eval": k_eval,
        "key": key,  # post-derivation chain, feeds k_test (and k_samp)
        "perms": perms,
        "mask": mask,
        "aux_mult": sched,
        "lr_sched": lr_sched,
        "val_stack": val_stack,
        "refit_perms": refit_perms,
    }


# Per-dispatch budget in member-epochs before a long device execution trips
# the axon tunnel's "TPU device error" abort: 10x4000 and 5x6000 proc sweeps
# both died, 5x4000 completes (runs/r3/heldout_6000ep_*.log, queue13/14/16).
CHUNK_BUDGET_MEMBER_EPOCHS = 20_000


def auto_chunk_epochs(n_members: int, num_epochs: int) -> int:
    """Chunk size keeping each dispatch within the observed-safe budget.

    Returns 0 (single dispatch) when the whole run fits."""
    total = n_members * num_epochs
    if total <= CHUNK_BUDGET_MEMBER_EPOCHS:
        return 0
    n_chunks = -(-total // CHUNK_BUDGET_MEMBER_EPOCHS)
    return -(-num_epochs // n_chunks)


def member_group_size(dataset: str, n_members: int) -> int:
    """Auto member-group size: how many members share one vmapped dispatch.

    XLA:TPU compile time for the PROC ensemble program grows steeply with
    the vmapped member width (measured round 5 on the axon backend: S=2
    compiles in ~260s, S=10 exceeded 570s and 10x4000 sweeps historically
    died mid-compile as "TPU device error" — the RECIPES <=5-member caveat).
    CVS/challenge compile fine to S>=16, so only proc groups by default.
    Returns 0 (no grouping) or a group size that divides n_members as
    evenly as possible at <=5, so every group reuses the SAME compiled
    executable (make_ensemble_runner memoizes on the structural key, which
    includes the member count only through array shapes)."""
    if dataset != "proc" or n_members <= 5:
        return 0
    n_groups = -(-n_members // 5)
    return -(-n_members // n_groups)


def train_ensemble(
    members: List[Dict], *, num_particles=1, optimizer="shared",
    chunk_epochs: int | None = None, ensemble_parallel: int = 0,
    ensemble_data_parallel: int = 1, member_group: int = 0,
):
    """Stack member preps, compile once, run all members to completion.

    ``chunk_epochs``: epochs per device dispatch.  None = auto (split only
    when the run exceeds the safe member-epoch budget), 0 = force a single
    dispatch, >0 = explicit chunk size.  Chunking threads the (state, best)
    carry across dispatches and is numerically identical to a single
    dispatch (tests/test_ensemble.py::test_chunked_matches_single_dispatch).

    ``ensemble_parallel`` > 1 shards the member axis over an ``('ens',)``
    device mesh (S/n members per device, zero collectives — the pod-scale
    sweep layout; tests/test_ensemble.py::test_member_sharded_matches_unsharded).
    ``ensemble_data_parallel`` > 1 additionally shards each member's
    minibatch dimension over a second 'data' mesh axis (S×n devices total;
    XLA inserts the per-loss gradient psum over 'data') — the layout when S
    alone can't fill a pod slice.
    """
    if member_group and len(members) > member_group:
        # split the member axis into equal dispatch groups: group 2+ hits
        # the memoized runner's jit cache, so the steep proc compile cost
        # is paid ONCE (see member_group_size) while training wall-clock
        # stays ~linear in S
        G = member_group
        n_groups = -(-len(members) // G)
        results = []
        for gi in range(0, len(members), G):
            grp = members[gi:gi + G]
            print(
                f"  member group {gi // G + 1}/{n_groups} "
                f"({len(grp)} members)", flush=True
            )
            results.append(train_ensemble(
                grp, num_particles=num_particles, optimizer=optimizer,
                chunk_epochs=chunk_epochs,
                ensemble_parallel=ensemble_parallel,
                ensemble_data_parallel=ensemble_data_parallel,
            ))
        return jax.tree.map(
            lambda *xs: jnp.concatenate([jnp.asarray(x) for x in xs], axis=0),
            *results,
        )

    m0 = members[0]
    spec, times, policy = m0["spec"], m0["times"], m0["policy"]
    cfg = m0["config"]

    def _trees_equal(trees):
        t0 = trees[0]
        return all(
            all(np.array_equal(np.asarray(t0[k]), np.asarray(t[k])) for k in t0)
            for t in trees[1:]
        )

    # seed sweeps vary only the TRAINING seed, so every member usually trains
    # on the identical dataset — feed it to the runner ONCE (shared_data)
    # instead of stacking S copies: the per-step minibatch gathers then read
    # one cache-resident array, not an S× HBM footprint. Splits can differ
    # per member (e.g. challenge folds without --data-seed), so detect.
    shared_data = _trees_equal([m["splits"]["train"] for m in members]) and (
        m0["val_stack"] is None
        or _trees_equal([m["val_stack"] for m in members])
    )
    runner = make_ensemble_runner(
        spec,
        times,
        cfg.learning_rate,
        m0["params"],
        policy=policy,
        num_particles=num_particles,
        optimizer=optimizer,
        prior_lr_mult=float(cfg.get("prior_lr_mult") or 1.0),
        refit_epochs=int(cfg.get("prior_refit_epochs") or 0),
        use_lr_sched=m0["lr_sched"] is not None,
        shared_data=shared_data,
        tail_ema_decay=float(cfg.get("tail_ema") or 0.0),
        tail_ema_start=int(cfg.get("tail_ema_start") or 0),
    )
    states = stack_members(
        [runner.init_state(m["params"], m["k_train"]) for m in members]
    )
    eval_keys = jnp.stack([m["k_eval"] for m in members])
    if shared_data:
        train_splits = {k: jnp.asarray(v) for k, v in m0["splits"]["train"].items()}
        val_stacks = (
            {k: jnp.asarray(v) for k, v in m0["val_stack"].items()}
            if m0["val_stack"] is not None
            else None
        )
    else:
        train_splits = stack_members([m["splits"]["train"] for m in members])
        val_stacks = (
            stack_members([m["val_stack"] for m in members])
            if m0["val_stack"] is not None
            else None
        )
    perms = jnp.asarray(np.stack([m["perms"] for m in members]))
    for m in members[1:]:
        assert np.array_equal(m["mask"], m0["mask"]), "member batch layouts differ"
    mask = jnp.asarray(m0["mask"])
    aux_mult = jnp.asarray(np.stack([m["aux_mult"] for m in members]))

    refit_perms = (
        jnp.asarray(np.stack([m["refit_perms"] for m in members]))
        if m0["refit_perms"] is not None
        else None
    )
    lr_sched = (
        jnp.asarray(np.stack([m["lr_sched"] for m in members]))
        if m0["lr_sched"] is not None
        else None
    )
    if (ensemble_parallel and ensemble_parallel > 1) or ensemble_data_parallel > 1:
        from structured_latent_odes_tpu.train.ensemble import (
            member_mesh,
            shard_runner_inputs,
        )

        mesh = member_mesh(ensemble_parallel or None, n_data=ensemble_data_parallel)
        (
            states, eval_keys, train_splits, val_stacks, perms, mask,
            aux_mult, refit_perms, lr_sched,
        ) = shard_runner_inputs(
            mesh, states=states, eval_keys=eval_keys, train_splits=train_splits,
            val_stacks=val_stacks, perms=perms, mask=mask, aux_mult=aux_mult,
            refit_perms=refit_perms, lr_sched=lr_sched, shared_data=shared_data,
        )
        print(
            f"  ensemble sharded over {mesh.devices.size} devices "
            f"({dict(mesh.shape)})", flush=True
        )
    E = perms.shape[1]
    if chunk_epochs is None:
        chunk_epochs = auto_chunk_epochs(len(members), E)
    if chunk_epochs and chunk_epochs < E:
        print(f"  chunked dispatch: {chunk_epochs} epochs/chunk", flush=True)
        result = run_chunked(
            runner, states, eval_keys, train_splits, val_stacks, perms, mask,
            aux_mult, chunk_epochs=chunk_epochs, lr_sched=lr_sched,
            refit_perms=refit_perms, verbose=True,
        )
    else:
        result = runner.run(
            states, eval_keys, train_splits, val_stacks, perms, mask, aux_mult,
            refit_perms=refit_perms, lr_sched=lr_sched,
        )
    jax.block_until_ready(result.best_crit)
    return result


# ---------------------------------------------------------------------------
# per-member finalization: standard test eval + artifact dump + headline metric
# ---------------------------------------------------------------------------


def finalize_member(
    dataset: str, member: Dict, best_params, best_epoch: int, root: str,
    eval_fns=None,
):
    """The sequential driver's post-training tail for one member: final test
    eval on the best params, the ``.npy`` artifact contract, and the
    reference notebook's headline metric for this dataset. Pass a shared
    ``eval_fns`` (make_eval_fns) so the S members reuse ONE set of compiled
    eval executables (a fresh make_eval_fns per member would recompile)."""
    from structured_latent_odes_tpu.eval import metrics as EM

    cfg, spec, times = member["config"], member["spec"], member["times"]
    splits, key = member["splits"], member["key"]
    if eval_fns is None:
        eval_fns = make_eval_fns(spec, times)
    out_dir = artifacts.results_dir(cfg.model, root)

    if dataset == "cvs":
        key, k_test = jax.random.split(key)
        eval_bs = cfg.mini_batch_size
    else:
        key, k_test, k_samp = jax.random.split(key, 3)
        eval_bs = cfg.mini_batch_size
        if dataset == "challenge":
            eval_bs = max(eval_bs, splits["val"]["observations"].shape[0])

    post, prior = final_test_eval(
        spec, best_params, k_test, splits[member["test_name"]], eval_fns, eval_bs
    )

    if dataset == "cvs":
        labels = {
            "iext": post.labels["iext"].squeeze(-1),
            "rtpr": post.labels["rtpr"].squeeze(-1),
        }
    elif dataset == "proc":
        labels = {
            "treatments": np.concatenate(
                [post.labels["C12"], post.labels["C6"]], axis=1
            ),
            "devices": np.concatenate([post.labels["aR"], post.labels["aS"]], axis=1),
        }
    else:
        labels = {
            "symptoms": post.labels["symptoms"].squeeze(-1),
            "shedding": post.labels["shedding"].squeeze(-1),
        }
    artifacts.dump_common(out_dir, post.observations, times, labels)
    artifacts.dump_recon(out_dir, "post", post.recon)
    artifacts.dump_recon(out_dir, "prior", prior.recon)

    heldout = dataset == "proc" and cfg.get("heldout")
    if dataset in ("proc", "challenge"):
        # the sequential proc/challenge drivers dump the num_samples-draw
        # sample bands over the full val fold unconditionally
        # (training_proc.py / training_challenge.py) — mirror them so sweep
        # seed dirs carry the full artifact contract; for heldout the
        # zero-shot metric additionally consumes this dump
        from structured_latent_odes_tpu.training_challenge import multiple_samples

        fb = {k: jax.device_put(v) for k, v in full_batch(splits["val"]).items()}
        _, _, reconstruct = eval_fns
        for tag, is_post in (("post", True), ("prior", False)):
            k_samp, sub = jax.random.split(k_samp)
            bands = multiple_samples(
                reconstruct, best_params, sub, fb, cfg.num_samples, is_post
            )
            artifacts.dump_sample_bands(
                out_dir, tag, bands["mu_25"], bands["mu_50"], bands["mu_75"]
            )

    metric_fn = {
        "cvs": EM.cvs_class_averaged_l1,
        "proc": EM.synbio_heldout_l1 if heldout else EM.synbio_device_averaged_l1,
        "challenge": EM.challenge_outcome_averaged_l1,
    }[dataset]
    out = {
        "seed": member["seed"],
        "best_epoch": int(best_epoch),
        "l1_post": metric_fn(out_dir, "post"),
        "l1_prior": metric_fn(out_dir, "prior"),
        "label_metrics_post": {k: float(v) for k, v in post.label_metrics.items()},
        "results_dir": out_dir,
    }
    if heldout:
        out["l1_post_per_condition"] = EM.synbio_heldout_l1_per_condition(
            out_dir, "post", base=out["l1_post"]
        )
    return out


# ---------------------------------------------------------------------------
# ensemble member selection (deploy-time model choice, no test peeking)
# ---------------------------------------------------------------------------


def veto_pool(members: List[Dict], min_best_epoch: int, margin: float) -> List[Dict]:
    """The guard + prior-veto survivor pool — mirrors the filter
    :func:`select_member` ranks within (tests pin the two against each
    other)."""
    pool = [m for m in members if m["best_epoch"] >= min_best_epoch] or members
    if not all(m.get("sel_prior_l1") is not None for m in pool):
        return pool
    best_sp = min(m["sel_prior_l1"] for m in pool)
    return [m for m in pool if m["sel_prior_l1"] <= best_sp * (1.0 + margin)]


def build_deployments(
    dataset: str,
    cfg,
    summary: List[Dict],
    results_root: str,
    min_best_epoch: int,
    prior_veto_margin: float,
) -> Dict:
    """Materialize and score the AVERAGED deployments (RESULTS.md queues
    36B/37 — blind 3/3, beating member selection on every workload):

    - ``deploy_mean/``      — elementwise mean of every member's prediction
      artifacts (mu_25/50/75 bands, sample dumps, solution_xt, z)
    - ``deploy_veto_mean/`` — the same mean over the guard+veto survivor pool

    Each is a REAL artifact dir (shared observation/label files copied from
    member 0) scored with the same notebook metric as the members, so the
    eval CLI runs on it unchanged. Averaging requires a SHARED eval split:
    proc CV sweeps without ``--data-seed`` tie fold membership to the member
    seed (data/proc.py::split_folds — reference quirk) and are skipped with
    a note; proc heldout splits by device name (deterministic) and cvs /
    challenge / data-seed'd proc sweeps all share their split.
    """
    heldout = dataset == "proc" and cfg.get("heldout")
    if dataset == "proc" and not heldout and cfg.get("data_seed") is None:
        return {
            "note": "skipped: per-member fold membership (no --data-seed); "
            "members have no shared val split to average over"
        }
    import shutil

    from structured_latent_odes_tpu.eval import metrics as EM

    metric_fn = {
        "cvs": EM.cvs_class_averaged_l1,
        "proc": EM.synbio_heldout_l1 if heldout else EM.synbio_device_averaged_l1,
        "challenge": EM.challenge_outcome_averaged_l1,
    }[dataset]
    pools = {
        "mean": summary,
        "veto_mean": veto_pool(summary, min_best_epoch, prior_veto_margin),
    }
    out = {}
    for name, pool in pools.items():
        dirs = [m["results_dir"] for m in pool]
        dst = os.path.join(results_root, f"deploy_{name}")
        os.makedirs(dst, exist_ok=True)
        for f in os.listdir(dirs[0]):
            if not f.endswith(".npy"):
                continue
            if f.startswith(("mu_", "solution_xt", "z_")):
                np.save(
                    os.path.join(dst, f),
                    np.mean([np.load(os.path.join(d, f)) for d in dirs], axis=0),
                )
            else:  # shared split data: observations, times, labels
                shutil.copyfile(os.path.join(dirs[0], f), os.path.join(dst, f))
        row = {
            "l1_post": metric_fn(dst, "post"),
            "l1_prior": metric_fn(dst, "prior"),
            "n_members": len(pool),
            "results_dir": dst,
        }
        if heldout:
            row["l1_post_per_condition"] = EM.synbio_heldout_l1_per_condition(
                dst, "post", base=row["l1_post"]
            )
        out[name] = row
    return out


def selection_prior_l1(member: Dict, best_params, reconstruct) -> float:
    """Prior-mode reconstruction L1 on the member's SELECTION split, at the
    member's best params — the second selection signal (alongside the
    criterion) that the round-3 blind run showed is needed: the val-ELBO /
    train-loss criterion is blind to PRIOR-mode quality, and the one blind
    anchor miss (proc seed 44 over 46, runs_evidence/r3/proc_blind_sel)
    happened exactly because the criterion winner had a lagging conditional
    prior that a dominated member did not.

    Test-blind by construction: the split read here is the one the member's
    best-model criterion already reads during training — the val split for
    the cvs/proc CV policies (the reference's own early stopping reads val,
    /root/reference/training_cvs.py:325-331, training_proc.py:380-388), the
    TRAIN split for challenge / proc_heldout whose criteria never touch a
    validation fold (training_challenge.py:368-375, training_proc.py:389-393).
    Keying matches eval_split: one key for the whole split + per-sample draw
    ids, so the number is batch-size-invariant.
    """
    if member["val_stack"] is not None:  # cvs / proc CV: the criterion's split
        stack = member["val_stack"]
    else:  # challenge / proc_heldout: criterion reads only train
        stack = stacked_minibatches(
            member["splits"]["train"],
            member["config"].mini_batch_size,
            shuffle=False,
        )
    key = jax.random.fold_in(member["k_eval"], 101)
    masks = np.asarray(stack["mask"])
    tot = n_tot = 0.0
    for i in range(masks.shape[0]):
        batch = {k: jnp.asarray(v)[i] for k, v in stack.items()}
        r = reconstruct(best_params, key, batch, False)
        n = float(masks[i].sum())
        tot += float(r["l1"]) * n
        n_tot += n
    return tot / max(n_tot, 1.0)


def select_member(
    members: List[Dict],
    min_best_epoch: int = 0,
    prior_veto_margin: float = 0.05,
) -> Dict:
    """Pick ONE member of a trained ensemble — the deployable answer to seed
    variance: train S seeds in one dispatch (~1 sequential run's wall-clock),
    keep the member the training-time selection signals prefer.  Uses only
    quantities available before touching the test split:

    - the best-model **criterion** (val-ELBO for cvs / proc CV; mean train
      epoch loss for challenge; FINAL-epoch mean train loss for proc_heldout,
      whose every-epoch-overwrite policy has no validation signal at all —
      training_proc.py:389-393) — the same per-member signal the reference's
      early stopping uses (training_cvs.py:325-331), and
    - ``sel_prior_l1``, the prior-mode recon L1 on the criterion's own split
      (:func:`selection_prior_l1`), which catches members whose conditional
      prior lags a good posterior (the round-3 blind proc miss).

    When every member carries ``sel_prior_l1`` the two signals combine as a
    **prior veto followed by a rank-combine**: members whose ``sel_prior_l1``
    exceeds the pool best by more than ``prior_veto_margin`` (relative) are
    excluded, then the survivors are ranked by each signal independently and
    the smallest rank-sum wins (criterion breaks rank ties).  Sweeps recorded
    before the prior signal existed fall back to the criterion argmin.

    The veto exists because pure rank addition is gameable by criterion
    dominance: in ``runs_evidence/r4/chal_priorlr5_confirm.sweep.json`` the
    criterion argmin (seed 77, sel_prior_l1 9.1% above pool best, test prior
    L1 47.02 vs the 38.969 anchor) out-rank-summed four members whose
    sel_prior_l1 clustered within 1e-4 of the best (their prior ranks 0-3
    cost them 4-7 criterion rank points each; all four sat at test prior
    37.2-37.4).  A relative margin keeps the rank-combine's tie-breaking
    power among genuinely-good-prior members while refusing to let a strong
    criterion buy back a clearly lagging conditional prior.  The 5% default
    was tuned on the 11 archived sweeps carrying ``sel_prior_l1``
    (runs_evidence/r4/*): it preserves every blind queue-32 pick, fixes the
    chal_priorlr5_confirm failure (picks seed 81: 37.27 prior), and improves
    proc_blind2 (11.41 vs 15.99) and gauss_chal_fresh_c (34.82 vs 39.20)
    retroactively; blind validation on fresh seeds is queue 35.

    ``min_best_epoch`` is the *converged-epoch guard*: with aux warm-up +
    late lr decay, a member whose criterion peaked mid-transient snapshots an
    unconverged model whose val-ELBO is not comparable to converged members';
    require ``best_epoch >= lr_decay_start`` so only converged members
    compete.  If NO member qualifies the unguarded pool is used and the
    returned dict carries ``guard_fallback=True`` so the condition is loud in
    sweep.json rather than silently picking a mid-transient snapshot.
    """
    eligible = [m for m in members if m["best_epoch"] >= min_best_epoch]
    fallback = bool(min_best_epoch > 0 and not eligible)
    pool = eligible or members
    n_vetoed = 0
    if len(pool) > 1 and all(m.get("sel_prior_l1") is not None for m in pool):
        best_sp = min(m["sel_prior_l1"] for m in pool)
        survivors = [
            m
            for m in pool
            if m["sel_prior_l1"] <= best_sp * (1.0 + prior_veto_margin)
        ]
        n_vetoed = len(pool) - len(survivors)
        pool = survivors  # never empty: the best_sp member always survives
        by_crit = sorted(range(len(pool)), key=lambda i: pool[i]["criterion"])
        by_prior = sorted(range(len(pool)), key=lambda i: pool[i]["sel_prior_l1"])
        rank = [0] * len(pool)
        for order in (by_crit, by_prior):
            for r, i in enumerate(order):
                rank[i] += r
        picked = pool[
            min(range(len(pool)), key=lambda i: (rank[i], pool[i]["criterion"]))
        ]
    else:
        picked = min(pool, key=lambda m: m["criterion"])
    picked = dict(picked)
    picked["guard_fallback"] = fallback
    picked["prior_veto_margin"] = prior_veto_margin
    picked["n_prior_vetoed"] = n_vetoed
    return picked


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def parse_seeds(s: str) -> List[int]:
    """'12,13,15' or '12..21' (inclusive) or a mix: '12..15,20'."""
    out: List[int] = []
    for part in s.split(","):
        if ".." in part:
            a, b = part.split("..")
            out.extend(range(int(a), int(b) + 1))
        else:
            out.append(int(part))
    return out


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", choices=sorted(PREP))
    p.add_argument("--seeds", required=True, help="e.g. 12,13,14 or 12..21")
    p.add_argument("--results-root", default="runs/sweep")
    p.add_argument("--model", choices=["Mechanistic", "MechanisticGauss"], default=None)
    p.add_argument("--num-epochs", type=int, default=None)
    p.add_argument("--aux-loss-multiplier", type=float, default=None)
    p.add_argument("--aux-mult-final", type=float, default=None)
    p.add_argument("--aux-anneal-epochs", type=int, default=None)
    p.add_argument("--aux-mult-start", type=float, default=None,
                   help="warm the aux multiplier up from this value")
    p.add_argument("--aux-warmup-epochs", type=int, default=None)
    p.add_argument("--prior-lr-mult", type=float, default=None,
                   help="conditional-prior net learning-rate multiplier")
    p.add_argument("--lr-final", type=float, default=None,
                   help="linear lr decay target (with --lr-decay-start)")
    p.add_argument("--lr-decay-start", type=int, default=None,
                   help="epoch at which linear lr decay begins")
    p.add_argument("--prior-refit-epochs", type=int, default=None,
                   help="after training, refit ONLY the conditional-prior "
                        "nets on the main ELBO for R epochs (fresh Adam; "
                        "posterior untouched) — closes the prior-lag gap")
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--mini-batch-size", type=int, default=None)
    p.add_argument("--optimizer", choices=["shared", "split"], default=None)
    p.add_argument("--num-particles", type=int, default=None)
    p.add_argument("--quantile-diff", type=float, default=None)
    p.add_argument("--split", type=int, default=None, help="proc/challenge fold")
    p.add_argument("--data-seed", type=int, default=None,
                   help="fold-split seed (defaults to each member's seed; "
                        "set to pin the fold while sweeping training seeds)")
    p.add_argument("--heldout", default=None, help="proc zero-shot device")
    p.add_argument("--num-samples", type=int, default=None)
    p.add_argument("--ode-backend", default=None)
    p.add_argument("--data-path", default=None)
    p.add_argument("--reference-data-dir", default=None)
    p.add_argument("--chunk-epochs", type=int, default=None,
                   help="epochs per device dispatch (default: auto-split "
                        "when members*epochs exceeds the safe budget; 0 "
                        "forces a single dispatch)")
    p.add_argument("--ensemble-parallel", type=int, default=0,
                   help="shard the member axis over this many devices "
                        "(('ens',) mesh, zero collectives; members must "
                        "divide evenly; default 0 = single device)")
    p.add_argument("--ensemble-data-parallel", type=int, default=1,
                   help="additionally shard each member's minibatch over "
                        "this many devices (('ens','data') 2-D mesh; total "
                        "devices = ensemble_parallel x this)")
    p.add_argument("--member-group", type=int, default=None,
                   help="members per vmapped dispatch (groups reuse one "
                        "compiled program). Default: auto — proc groups at "
                        "<=5 (XLA compile time blows up with member width "
                        "there), other datasets run all members in one "
                        "dispatch. 0 forces a single dispatch.")
    p.add_argument("--tail-ema", type=float, default=None,
                   help="track a tail-phase EMA of params with this decay "
                        "(e.g. 0.99); each member's EMA weights get their "
                        "own test eval recorded under members[i]['ema'] "
                        "(mechanism experiment, selection unchanged)")
    p.add_argument("--tail-ema-start", type=int, default=None,
                   help="epoch the EMA starts decaying (default: "
                        "lr_decay_start if set, else 0)")
    p.add_argument("--evidence-dir", default=None,
                   help="also write sweep.json to this dir as "
                        "<results-root-basename>.sweep.json the moment the "
                        "sweep completes (transactional evidence for queue "
                        "scripts; see runs_evidence/README.md)")
    p.add_argument("--prior-veto-margin", type=float, default=0.05,
                   help="selection veto: exclude members whose selection-"
                        "split prior L1 exceeds the pool best by this "
                        "relative margin before rank-combining (default "
                        "0.05, tuned on runs_evidence/r4)")
    return p.parse_args(argv)


def load_base_config(dataset: str):
    from structured_latent_odes_tpu.data.configs import (
        load_challenge_config,
        load_cvs_config,
        load_proc_config,
    )

    return {
        "cvs": load_cvs_config,
        "proc": load_proc_config,
        "challenge": load_challenge_config,
    }[dataset]()


def main(argv=None):
    args = parse_args(argv)
    config = load_base_config(args.dataset)
    for k, v in vars(args).items():
        k2 = k.replace("-", "_")
        if v is not None and k2 in config:
            config[k2] = v
    if args.num_epochs is not None:
        config.num_epochs = args.num_epochs
    if args.heldout:
        config.heldout = args.heldout
    if args.reference_data_dir:
        config.reference_data_dir = args.reference_data_dir
    config.aux_mult_final = args.aux_mult_final
    config.aux_anneal_epochs = args.aux_anneal_epochs
    config.aux_mult_start = args.aux_mult_start
    config.aux_warmup_epochs = args.aux_warmup_epochs
    config.prior_refit_epochs = args.prior_refit_epochs
    config.data_seed = args.data_seed
    config.lr_final = args.lr_final
    config.lr_decay_start = args.lr_decay_start
    config.tail_ema = args.tail_ema
    config.tail_ema_start = (
        args.tail_ema_start
        if args.tail_ema_start is not None
        else (args.lr_decay_start or 0)
    )

    seeds = parse_seeds(args.seeds)
    # member axis is vmapped, invisible to traced shapes — let the
    # semilinear_auto dispatch account for the physical width (zoo.py)
    config.auto_width_mult = len(seeds)
    os.makedirs(args.results_root, exist_ok=True)
    print(f"sweep: {args.dataset} x {len(seeds)} seeds {seeds}")
    print(config.to_json())

    t0 = time.time()
    members = [prepare_member(args.dataset, config, s) for s in seeds]
    t_prep = time.time() - t0
    group = (
        args.member_group
        if args.member_group is not None
        else member_group_size(args.dataset, len(seeds))
    )
    result = train_ensemble(
        members,
        num_particles=config.get("num_particles", 1),
        optimizer=config.get("optimizer", "shared"),
        chunk_epochs=args.chunk_epochs,
        ensemble_parallel=args.ensemble_parallel,
        ensemble_data_parallel=args.ensemble_data_parallel,
        member_group=group,
    )
    t_train = time.time() - t0 - t_prep
    E = members[0]["perms"].shape[0]
    nb = members[0]["perms"].shape[1]
    print(
        f"trained {len(seeds)} members x {E} epochs ({len(seeds) * E * nb} total "
        f"steps) in {t_train:.1f}s — prep {t_prep:.1f}s"
    )

    best_params_host = jax.tree.map(np.asarray, result.best_params)
    best_epochs = np.asarray(result.best_epoch)
    best_crits = np.asarray(result.best_crit)
    shared_eval_fns = make_eval_fns(members[0]["spec"], members[0]["times"])
    summary = []
    for i, m in enumerate(members):
        bp = jax.tree.map(lambda x: x[i], best_params_host)
        row = finalize_member(
            args.dataset, m, bp, best_epochs[i],
            os.path.join(args.results_root, f"seed{m['seed']}"),
            eval_fns=shared_eval_fns,
        )
        row["criterion"] = float(best_crits[i])
        row["sel_prior_l1"] = selection_prior_l1(m, bp, shared_eval_fns[2])
        if result.ema_params is not None:
            # the tail-EMA weights get the same full finalization into a
            # sibling artifact dir — a per-seed paired comparison of EMA vs
            # best-snapshot on identical data/eval keying
            ep = jax.tree.map(lambda x: np.asarray(x[i]), result.ema_params)
            erow = finalize_member(
                args.dataset, m, ep, best_epochs[i],
                os.path.join(args.results_root, f"seed{m['seed']}", "ema"),
                eval_fns=shared_eval_fns,
            )
            row["ema"] = {
                "l1_post": erow["l1_post"],
                "l1_prior": erow["l1_prior"],
                "label_metrics_post": erow["label_metrics_post"],
                "sel_prior_l1": selection_prior_l1(m, ep, shared_eval_fns[2]),
            }
        summary.append(row)
        print(
            f"seed {m['seed']}: post {row['l1_post']:.4f}  prior "
            f"{row['l1_prior']:.4f}  sel_prior_l1 {row['sel_prior_l1']:.4f}  "
            f"best_epoch {row['best_epoch']}  {row['label_metrics_post']}"
        )

    wall = time.time() - t0
    # the converged-epoch guard mirrors epoch_lr_scale's activation condition:
    # decay (and hence the notion of a converged epoch) only exists when BOTH
    # lr_decay_start and lr_final are set
    guard = (
        int(config.get("lr_decay_start") or 0)
        if config.get("lr_final") is not None
        else 0
    )
    picked = select_member(
        summary,
        min_best_epoch=guard,
        prior_veto_margin=args.prior_veto_margin,
    )
    if picked["guard_fallback"]:
        print(
            f"WARNING: no member reached best_epoch>={guard}; selection fell "
            "back to the unguarded pool (selected.guard_fallback=true)"
        )
    deployments = build_deployments(
        args.dataset, config, summary, args.results_root,
        guard, args.prior_veto_margin,
    )
    out = {
        "dataset": args.dataset,
        "seeds": seeds,
        "config": json.loads(config.to_json()),
        "members": summary,
        "selected": {**picked, "min_best_epoch": guard},
        "deployments": deployments,
        "wall_seconds": wall,
        "train_seconds": t_train,
    }
    with open(os.path.join(args.results_root, "sweep.json"), "w") as f:
        json.dump(out, f, indent=1)
    if args.evidence_dir:
        # Transactional evidence copy (VERDICT r4 ask #6): the committed
        # record lands the moment THIS sweep finishes, not at the end of a
        # multi-sweep queue script — a queue that dies mid-run still leaves
        # every completed sweep's evidence in place.
        os.makedirs(args.evidence_dir, exist_ok=True)
        name = os.path.basename(os.path.normpath(args.results_root))
        with open(os.path.join(args.evidence_dir, f"{name}.sweep.json"), "w") as f:
            json.dump(out, f, indent=1)
    posts = [r["l1_post"] for r in summary]
    priors = [r["l1_prior"] for r in summary]
    print(
        f"SWEEP DONE [{wall:.0f}s]: post median {np.median(posts):.4f} "
        f"(min {min(posts):.4f} max {max(posts):.4f})  prior median "
        f"{np.median(priors):.4f} (min {min(priors):.4f} max {max(priors):.4f})"
    )
    print(
        f"SELECTED (criterion+prior rank-combine, best_epoch>={guard}): "
        f"seed {picked['seed']} -> post {picked['l1_post']:.4f}  "
        f"prior {picked['l1_prior']:.4f}"
    )
    for name, row in deployments.items():
        if "l1_post" in row:
            print(
                f"DEPLOYED {name} ({row['n_members']} members): "
                f"post {row['l1_post']:.4f}  prior {row['l1_prior']:.4f}"
            )
    return out


if __name__ == "__main__":
    main()
