"""Ensemble (vmapped multi-run) trainer: member parity with sequential runs.

Each ensemble member must reproduce the sequential driver's training run at
the same seed — same shuffles, same device key chain, same best-model
selection — so sweep results are interchangeable with CLI-run results.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structured_latent_odes_tpu.data.configs import load_cvs_config
from structured_latent_odes_tpu.data.loader import stacked_minibatches
from structured_latent_odes_tpu.models import cvs_spec, init_params
from structured_latent_odes_tpu.train.driver import run_training_epochs
from structured_latent_odes_tpu.train.ensemble import (
    aux_mult_schedule,
    build_epoch_perms,
    make_ensemble_runner,
    stack_members,
)
from structured_latent_odes_tpu.train.svi import make_eval_fns, make_train_step
from structured_latent_odes_tpu.utils import set_seed

T = 16
N_TRAIN, N_VAL, BS = 10, 6, 4

# the suite is compile-bound on the CPU host: memoize the jitted runner /
# train-step factories on their STRUCTURAL key so tests with the same model
# structure share one compilation (correctness is unaffected — the key holds
# everything that shapes the trace; per-test data flows in as arguments)
_RUNNER_CACHE = {}
_SEQ_CACHE = {}


def _cached_runner(spec, lr, params_example, **kw):
    key = (spec, lr, tuple(sorted(kw.items())))
    if key not in _RUNNER_CACHE:
        _RUNNER_CACHE[key] = make_ensemble_runner(
            spec, jnp.arange(float(T)), lr, params_example, **kw
        )
    return _RUNNER_CACHE[key]


def _cached_train_step(spec, lr, params):
    key = (spec, lr)
    if key not in _SEQ_CACHE:
        _SEQ_CACHE[key] = (
            make_train_step(spec, jnp.arange(float(T)), lr, params),
            make_eval_fns(spec, jnp.arange(float(T))),
        )
    return _SEQ_CACHE[key]


def _tiny_config(num_epochs, anneal=False, lrdecay=False):
    config = load_cvs_config()
    config.seq_len = T
    config.mini_batch_size = BS
    config.num_epochs = num_epochs
    if anneal:
        config.aux_mult_final = 4.6
        config.aux_anneal_epochs = max(1, num_epochs - 1)
    else:
        config.aux_mult_final = None
        config.aux_anneal_epochs = None
    if lrdecay:
        config.lr_final = config.learning_rate * 0.1
        config.lr_decay_start = 1
    return config


def _synthetic_splits():
    r = np.random.RandomState(99)

    def split(n):
        return {
            "observations": r.rand(n, 3, T).astype(np.float32),
            "iext": (r.rand(n, 1) > 0.5).astype(np.float32),
            "rtpr": (r.rand(n, 1) > 0.5).astype(np.float32),
        }

    return {"train": split(N_TRAIN), "val": split(N_VAL)}


def _sequential_run(config, splits, seed, policy):
    """The CLI driver's training loop at this seed (key chain included)."""
    spec = cvs_spec(config, n_time=T)
    key = set_seed(seed)
    key, k_init, k_train, k_eval = jax.random.split(key, 4)
    params = init_params(k_init, spec)
    (init_state, train_step, train_epoch), eval_fns = _cached_train_step(
        spec, config.learning_rate, params
    )
    state = init_state(params, k_train)

    if policy == "cvs":
        def select_best(epoch, val, train_s, best, params_now, epoch_losses):
            val_elbo = sum(val["post"].elbo) * len(val["post"].elbo)
            if best["criterion"] >= val_elbo:
                return {"params": params_now, "epoch": epoch, "criterion": val_elbo}
            return best
    else:  # challenge policy: best mean TRAIN epoch loss
        def select_best(epoch, val, train_s, best, params_now, epoch_losses):
            crit = float(np.mean(epoch_losses)) if epoch_losses else np.inf
            if crit < best["criterion"]:
                return {"params": params_now, "epoch": epoch, "criterion": crit}
            return best

    state, best = run_training_epochs(
        spec=spec,
        state=state,
        train_step=train_step,
        eval_fns=eval_fns,
        splits=splits,
        config=config,
        rng=np.random.RandomState(seed),
        eval_key=k_eval,
        select_best=select_best,
        eval_train_stats=False,
        train_epoch=train_epoch,
    )
    return state, best


def _ensemble_run(config, splits, seeds, policy, optimizer="shared",
                  ensemble_parallel=0, ens_data=1, shared_data=False):
    from structured_latent_odes_tpu.train.ensemble import lr_scale_schedule

    spec = cvs_spec(config, n_time=T)
    ts = jnp.arange(float(T))
    lr_sched = lr_scale_schedule(config, config.num_epochs)
    members = []
    for seed in seeds:
        key = set_seed(seed)
        key, k_init, k_train, k_eval = jax.random.split(key, 4)
        params = init_params(k_init, spec)
        perms, mask = build_epoch_perms(
            N_TRAIN, BS, config.num_epochs, np.random.RandomState(seed)
        )
        members.append(
            {"params": params, "k_train": k_train, "k_eval": k_eval,
             "perms": perms, "mask": mask,
             "aux_mult": aux_mult_schedule(config, config.num_epochs)}
        )
    runner = _cached_runner(
        spec, config.learning_rate, members[0]["params"], policy=policy,
        optimizer=optimizer, use_lr_sched=lr_sched is not None,
        shared_data=shared_data,
    )
    states = stack_members(
        [runner.init_state(m["params"], m["k_train"]) for m in members]
    )
    eval_keys = jnp.stack([m["k_eval"] for m in members])
    if shared_data:
        train_splits = {k: jnp.asarray(v) for k, v in splits["train"].items()}
        val_stacks = (
            {
                k: jnp.asarray(v)
                for k, v in stacked_minibatches(
                    splits["val"], BS, shuffle=False
                ).items()
            }
            if policy in ("cvs", "proc")
            else None
        )
    else:
        train_splits = stack_members([splits["train"]] * len(seeds))
        val_stacks = (
            stack_members(
                [stacked_minibatches(splits["val"], BS, shuffle=False)]
                * len(seeds)
            )
            if policy in ("cvs", "proc")
            else None
        )
    perms = jnp.asarray(np.stack([m["perms"] for m in members]))
    mask = jnp.asarray(members[0]["mask"])
    aux = jnp.asarray(np.stack([m["aux_mult"] for m in members]))
    lrs = (
        jnp.asarray(np.stack([lr_sched] * len(seeds)))
        if lr_sched is not None
        else None
    )
    if ensemble_parallel or ens_data > 1:
        from structured_latent_odes_tpu.train.ensemble import (
            member_mesh,
            shard_runner_inputs,
        )

        mesh = member_mesh(ensemble_parallel or None, n_data=ens_data)
        (
            states, eval_keys, train_splits, val_stacks, perms, mask, aux,
            _rp, lrs,
        ) = shard_runner_inputs(
            mesh, states=states, eval_keys=eval_keys,
            train_splits=train_splits, val_stacks=val_stacks, perms=perms,
            mask=mask, aux_mult=aux, lr_sched=lrs, shared_data=shared_data,
        )
    return runner.run(
        states, eval_keys, train_splits, val_stacks, perms, mask, aux,
        lr_sched=lrs,
    )


def _assert_member_matches(result, i, state_seq, best_seq):
    for a, b in zip(
        jax.tree.leaves(state_seq.params),
        jax.tree.leaves(jax.tree.map(lambda x: x[i], result.state.params)),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6)
    assert int(result.best_epoch[i]) == int(best_seq["epoch"])
    np.testing.assert_allclose(
        float(result.best_crit[i]), float(best_seq["criterion"]), rtol=2e-4
    )
    for a, b in zip(
        jax.tree.leaves(best_seq["params"]),
        jax.tree.leaves(jax.tree.map(lambda x: x[i], result.best_params)),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize(
    "anneal,lrdecay", [(False, False), (True, False), (False, True)]
)
def test_ensemble_members_match_sequential_cvs(anneal, lrdecay):
    """Two-member ensemble (val-ELBO policy, optionally annealed aux scale /
    lr-decay schedule) reproduces each sequential driver run: final params,
    best criterion, best epoch, best params."""
    config = _tiny_config(num_epochs=3, anneal=anneal, lrdecay=lrdecay)
    splits = _synthetic_splits()
    seeds = [3, 4]
    result = _ensemble_run(config, splits, seeds, "cvs")
    for i, seed in enumerate(seeds):
        state_seq, best_seq = _sequential_run(config, splits, seed, "cvs")
        _assert_member_matches(result, i, state_seq, best_seq)


def test_shared_data_matches_stacked():
    """shared_data=True (one train split / val stack, no member axis) is
    bit-identical to the stacked-copies layout — same gathers, same order;
    only the HBM footprint changes."""
    config = _tiny_config(num_epochs=2)
    splits = _synthetic_splits()
    seeds = [3, 4]
    r_stacked = _ensemble_run(config, splits, seeds, "cvs")
    r_shared = _ensemble_run(config, splits, seeds, "cvs", shared_data=True)
    np.testing.assert_array_equal(
        np.asarray(r_stacked.best_crit), np.asarray(r_shared.best_crit)
    )
    np.testing.assert_array_equal(
        np.asarray(r_stacked.best_epoch), np.asarray(r_shared.best_epoch)
    )
    for a, b in zip(
        jax.tree.leaves(r_stacked.best_params),
        jax.tree.leaves(r_shared.best_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(r_stacked.state.params),
        jax.tree.leaves(r_shared.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_shared_data_member_sharded_matches_unsharded():
    """shared_data composes with the ('ens',) mesh: the split replicates,
    members shard, results match the unsharded shared run exactly."""
    config = _tiny_config(num_epochs=2)
    splits = _synthetic_splits()
    seeds = [3, 4]
    r_unsharded = _ensemble_run(config, splits, seeds, "cvs", shared_data=True)
    r_sharded = _ensemble_run(
        config, splits, seeds, "cvs", shared_data=True, ensemble_parallel=2
    )
    np.testing.assert_allclose(
        np.asarray(r_unsharded.best_crit),
        np.asarray(r_sharded.best_crit),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(r_unsharded.best_epoch), np.asarray(r_sharded.best_epoch)
    )


@pytest.mark.slow
def test_member_sharded_matches_unsharded():
    """Sharding the member axis over the 8-device ('ens',) mesh is pure
    placement (members never communicate): the sharded run must reproduce
    the single-device vmapped run — selection criterion, best epoch, and
    best params per member."""
    config = _tiny_config(3)
    splits = _synthetic_splits()
    seeds = list(range(8))
    res_a = _ensemble_run(config, splits, seeds, "cvs")
    res_b = _ensemble_run(config, splits, seeds, "cvs", ensemble_parallel=8)
    np.testing.assert_allclose(
        np.asarray(res_b.best_crit), np.asarray(res_a.best_crit), rtol=1e-6
    )
    assert np.array_equal(
        np.asarray(res_b.best_epoch), np.asarray(res_a.best_epoch)
    )
    for a, b in zip(
        jax.tree.leaves(res_a.best_params), jax.tree.leaves(res_b.best_params)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7
        )


@pytest.mark.slow
def test_ens_data_sharded_matches_unsharded():
    """The 2-D ('ens','data') mesh — 4 members x 2 batch shards each — must
    reproduce the single-device vmapped run up to f32 psum reduction order:
    each 'data' column computes gradients on half of every minibatch and XLA
    reduces them, which is the same math as the unsharded batch."""
    config = _tiny_config(3)
    splits = _synthetic_splits()
    seeds = list(range(4))
    res_a = _ensemble_run(config, splits, seeds, "cvs")
    res_b = _ensemble_run(config, splits, seeds, "cvs", ensemble_parallel=4,
                          ens_data=2)
    np.testing.assert_allclose(
        np.asarray(res_b.best_crit), np.asarray(res_a.best_crit),
        rtol=2e-4,
    )
    assert np.array_equal(
        np.asarray(res_b.best_epoch), np.asarray(res_a.best_epoch)
    )
    for a, b in zip(
        jax.tree.leaves(res_a.best_params), jax.tree.leaves(res_b.best_params)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6
        )


def test_member_sharding_requires_divisible_members():
    from structured_latent_odes_tpu.train.ensemble import (
        member_mesh,
        shard_member_inputs,
    )

    mesh = member_mesh(8)
    with pytest.raises(ValueError, match="not divisible"):
        shard_member_inputs(mesh, (np.zeros((6, 3)),))
    with pytest.raises(ValueError, match="available devices"):
        member_mesh(9)


@pytest.mark.slow
def test_ensemble_split_optimizer_runs():
    """--optimizer split must work in the ensemble trainer when no lr
    schedule is configured (it used to crash at trace time because a dummy
    lr_scale array was always threaded into the batch), and must fail at
    BUILD time with a clear message when one is."""
    config = _tiny_config(num_epochs=2)
    splits = _synthetic_splits()
    result = _ensemble_run(config, splits, [3, 4], "cvs", optimizer="split")
    assert np.all(np.isfinite(np.asarray(result.best_crit)))

    with pytest.raises(ValueError, match="optimizer='shared'"):
        _ensemble_run(
            _tiny_config(num_epochs=2, lrdecay=True), splits, [3, 4], "cvs",
            optimizer="split",
        )


@pytest.mark.slow
def test_ensemble_members_match_sequential_challenge_policy():
    """Train-loss selection (challenge policy) parity — no val eval at all."""
    config = _tiny_config(num_epochs=3)
    splits = _synthetic_splits()
    seeds = [7]
    result = _ensemble_run(config, splits, seeds, "challenge")
    state_seq, best_seq = _sequential_run(config, splits, 7, "challenge")
    _assert_member_matches(result, 0, state_seq, best_seq)


@pytest.mark.slow
def test_ensemble_heldout_policy_overwrites():
    """proc_heldout policy: best params == final params, epoch == E."""
    config = _tiny_config(num_epochs=2)
    splits = _synthetic_splits()
    result = _ensemble_run(config, splits, [5], "proc_heldout")
    assert int(result.best_epoch[0]) == config.num_epochs + 1
    for a, b in zip(
        jax.tree.leaves(result.state.params), jax.tree.leaves(result.best_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
@pytest.mark.parametrize("policy", ["cvs", "challenge"])
def test_chunked_matches_single_dispatch(policy):
    """run_chunked (multi-dispatch epoch chunks, uneven last chunk) must
    reproduce the single-dispatch run exactly: same final params, best
    criterion/epoch/params, same loss history. This is the path long runs
    take on axon, where one >20k member-epoch dispatch aborts the device."""
    from structured_latent_odes_tpu.train.ensemble import (
        lr_scale_schedule,
        run_chunked,
    )

    config = _tiny_config(num_epochs=4)  # E = 5 epochs -> chunks of 2,2,1
    splits = _synthetic_splits()
    seeds = [3, 4]
    spec = cvs_spec(config, n_time=T)
    ts = jnp.arange(float(T))
    members = []
    for seed in seeds:
        key = set_seed(seed)
        key, k_init, k_train, k_eval = jax.random.split(key, 4)
        members.append(
            {"params": init_params(k_init, spec), "k_train": k_train,
             "k_eval": k_eval,
             "perms": build_epoch_perms(
                 N_TRAIN, BS, config.num_epochs, np.random.RandomState(seed)
             )[0],
             "aux_mult": aux_mult_schedule(config, config.num_epochs)}
        )
    mask = build_epoch_perms(N_TRAIN, BS, 0, np.random.RandomState(0))[1]
    runner = _cached_runner(
        spec, config.learning_rate, members[0]["params"], policy=policy,
    )
    states = stack_members(
        [runner.init_state(m["params"], m["k_train"]) for m in members]
    )
    eval_keys = jnp.stack([m["k_eval"] for m in members])
    train_splits = stack_members([splits["train"]] * len(seeds))
    val_stacks = (
        stack_members(
            [stacked_minibatches(splits["val"], BS, shuffle=False)] * len(seeds)
        )
        if policy == "cvs"
        else None
    )
    perms = jnp.asarray(np.stack([m["perms"] for m in members]))
    aux = jnp.asarray(np.stack([m["aux_mult"] for m in members]))

    single = runner.run(
        states, eval_keys, train_splits, val_stacks, perms,
        jnp.asarray(mask), aux,
    )
    chunked = run_chunked(
        runner, states, eval_keys, train_splits, val_stacks, perms,
        jnp.asarray(mask), aux, chunk_epochs=2,
    )

    for a, b in zip(
        jax.tree.leaves(single.state.params), jax.tree.leaves(chunked.state.params)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(chunked.best_crit), np.asarray(single.best_crit), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(chunked.best_epoch), np.asarray(single.best_epoch)
    )
    for a, b in zip(
        jax.tree.leaves(single.best_params), jax.tree.leaves(chunked.best_params)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)
    for k in single.history:
        np.testing.assert_allclose(
            np.asarray(chunked.history[k]), np.asarray(single.history[k]),
            rtol=1e-5, atol=1e-7,
        )


def test_auto_chunk_epochs_budget():
    """Auto-chunking splits exactly the runs the axon tunnel kills (10x4000,
    5x6000) and leaves the observed-safe ones (5x4000) in one dispatch."""
    from structured_latent_odes_tpu.sweep import auto_chunk_epochs

    assert auto_chunk_epochs(5, 4000) == 0          # observed safe
    assert auto_chunk_epochs(10, 4000) == 2000      # observed fatal -> 2 chunks
    assert auto_chunk_epochs(5, 6001) == 3001       # observed fatal -> 2 chunks
    assert auto_chunk_epochs(1, 20000) == 0
    assert auto_chunk_epochs(8, 100) == 0


def test_build_epoch_perms_matches_stacked_minibatches():
    """Permutation builder consumes the host RNG exactly like the driver's
    stacked_minibatches — same composition, same padding."""
    rng1 = np.random.RandomState(0)
    rng2 = np.random.RandomState(0)
    perms, mask = build_epoch_perms(N_TRAIN, BS, 1, rng1)
    split = _synthetic_splits()["train"]
    for e in range(2):
        stacked = stacked_minibatches(split, BS, shuffle=True, rng=rng2)
        np.testing.assert_array_equal(stacked["sample_id"], perms[e])
        np.testing.assert_array_equal(stacked["mask"], mask)
        np.testing.assert_array_equal(
            stacked["observations"], split["observations"][perms[e]]
        )


@pytest.mark.slow
def test_prior_refit_changes_only_priors():
    """refit_epochs trains ONLY the conditional-prior nets after selection:
    encoder/decoder/aux of the refit best params stay bit-identical to the
    un-refit run's best params; the priors move."""
    config = _tiny_config(num_epochs=2)
    splits = _synthetic_splits()
    spec = cvs_spec(config, n_time=T)
    ts = jnp.arange(float(T))

    def build(refit):
        runner = _cached_runner(
            spec, config.learning_rate,
            init_params(jax.random.key(0), spec), policy="cvs",
            refit_epochs=refit,
        )
        seed = 3
        key = set_seed(seed)
        key, k_init, k_train, k_eval = jax.random.split(key, 4)
        params = init_params(k_init, spec)
        rng = np.random.RandomState(seed)
        perms, mask = build_epoch_perms(N_TRAIN, BS, config.num_epochs, rng)
        rperms = build_epoch_perms(N_TRAIN, BS, refit - 1, rng)[0] if refit else None
        states = stack_members([runner.init_state(params, k_train)])
        val = stack_members([stacked_minibatches(splits["val"], BS, shuffle=False)])
        return runner.run(
            states,
            jnp.stack([k_eval]),
            stack_members([splits["train"]]),
            val,
            jnp.asarray(perms[None]),
            jnp.asarray(mask),
            jnp.ones((1, config.num_epochs + 1), np.float32) * 46.0,
            refit_perms=None if not refit else jnp.asarray(rperms[None]),
        )

    plain = build(0)
    refit = build(3)
    for g in ("encoder", "decoder", "aux", "aux_std"):
        for a, b in zip(
            jax.tree.leaves(plain.best_params[g]), jax.tree.leaves(refit.best_params[g])
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree.leaves(plain.best_params["priors"]),
            jax.tree.leaves(refit.best_params["priors"]),
        )
    ]
    assert max(diffs) > 0, "refit did not move the prior nets"
    assert int(plain.best_epoch[0]) == int(refit.best_epoch[0])


def test_selection_prior_l1_both_split_modes():
    """selection_prior_l1 evaluates prior-mode recon on the criterion's own
    split: the stacked val minibatches when the member has them (cvs/proc CV)
    and the TRAIN split otherwise (challenge/proc_heldout), returning a
    finite masked-mean L1 either way."""
    from structured_latent_odes_tpu.sweep import selection_prior_l1

    config = _tiny_config(1)
    spec = cvs_spec(config, n_time=T)
    key = set_seed(7)
    _, k_init, _, k_eval = jax.random.split(key, 4)
    params = init_params(k_init, spec)
    splits = _synthetic_splits()
    eval_fns = make_eval_fns(spec, jnp.arange(float(T)))
    member = {
        "config": config,
        "splits": splits,
        "k_eval": k_eval,
        "val_stack": stacked_minibatches(splits["val"], BS, shuffle=False),
    }
    l1_val = selection_prior_l1(member, params, eval_fns[2])
    member["val_stack"] = None
    l1_train = selection_prior_l1(member, params, eval_fns[2])
    for v in (l1_val, l1_train):
        assert np.isfinite(v) and v > 0
    # different splits -> (generically) different numbers
    assert l1_val != l1_train


@pytest.mark.slow
def test_tail_ema_tracking():
    """Tail-phase EMA (make_ensemble_runner(tail_ema_decay=...)):

    1. with start > E the EMA only tracks params -> ema_params == final
       params exactly, and every other output is unchanged vs a no-EMA
       runner (the feature is observationally pure);
    2. with start=0 the EMA equals the hand-computed numpy EMA of the
       per-epoch params captured via 1-epoch run_chunk calls;
    3. run_chunked threads the EMA across chunk boundaries (== single run).
    """
    from structured_latent_odes_tpu.train.ensemble import run_chunked

    config = _tiny_config(num_epochs=3)  # E = 4 epochs
    splits = _synthetic_splits()
    seeds = [5, 6]
    spec = cvs_spec(config, n_time=T)
    members = []
    for seed in seeds:
        key = set_seed(seed)
        key, k_init, k_train, k_eval = jax.random.split(key, 4)
        members.append(
            {"params": init_params(k_init, spec), "k_train": k_train,
             "k_eval": k_eval,
             "perms": build_epoch_perms(
                 N_TRAIN, BS, config.num_epochs, np.random.RandomState(seed)
             )[0],
             "aux_mult": aux_mult_schedule(config, config.num_epochs)}
        )
    mask = jnp.asarray(
        build_epoch_perms(N_TRAIN, BS, 0, np.random.RandomState(0))[1]
    )
    train_splits = stack_members([splits["train"]] * len(seeds))
    val_stacks = stack_members(
        [stacked_minibatches(splits["val"], BS, shuffle=False)] * len(seeds)
    )
    perms = jnp.asarray(np.stack([m["perms"] for m in members]))
    aux = jnp.asarray(np.stack([m["aux_mult"] for m in members]))
    E = perms.shape[1]

    def build(decay, start):
        r = _cached_runner(
            spec, config.learning_rate, members[0]["params"], policy="cvs",
            tail_ema_decay=decay, tail_ema_start=start,
        )
        states = stack_members(
            [r.init_state(m["params"], m["k_train"]) for m in members]
        )
        keys = jnp.stack([m["k_eval"] for m in members])
        return r, states, keys

    # 1. inactive EMA == final params; other outputs match the no-EMA runner
    r_off, states, keys = build(0.0, 0)
    r_late, states_l, keys_l = build(0.9, E + 50)
    base = r_off.run(states, keys, train_splits, val_stacks, perms, mask, aux)
    late = r_late.run(states_l, keys_l, train_splits, val_stacks, perms, mask, aux)
    assert base.ema_params is None and late.ema_params is not None
    for a, b in zip(
        jax.tree.leaves(late.ema_params), jax.tree.leaves(late.state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(base.best_params),
                    jax.tree.leaves(late.best_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(base.best_crit),
                                  np.asarray(late.best_crit))

    # 2. active EMA == numpy EMA of per-epoch params, seeded at the INITIAL
    # params (the implementation's "p_{-1}"), captured via 1-epoch chunks
    d = 0.75
    r_ema, states_e, keys_e = build(d, 0)
    res = r_ema.run(states_e, keys_e, train_splits, val_stacks, perms, mask, aux)
    carry = (states_e, keys_e, states_e.params,
             jnp.full((len(seeds),), jnp.inf, jnp.float32),
             jnp.zeros((len(seeds),), jnp.int32),
             jax.tree.map(jnp.asarray, states_e.params))
    expect = jax.tree.map(np.asarray, states_e.params)
    for e in range(E):
        carry, _ = r_ema.run_chunk(
            carry, train_splits, val_stacks, perms[:, e:e + 1], mask,
            aux[:, e:e + 1], None, np.arange(e, e + 1),
        )
        p_e = jax.tree.map(np.asarray, carry[0].params)
        expect = jax.tree.map(
            lambda old, new: d * old + (1 - d) * new, expect, p_e)
    for a, b in zip(jax.tree.leaves(res.ema_params), jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-6, atol=1e-7)
    # 3. and the chunked driver threads it identically
    chunked = run_chunked(
        r_ema, states_e, keys_e, train_splits, val_stacks, perms, mask, aux,
        chunk_epochs=3,  # chunks of 3 + 1
    )
    for a, b in zip(jax.tree.leaves(chunked.ema_params),
                    jax.tree.leaves(res.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_member_group_size_policy():
    """Auto member-grouping (sweep.member_group_size): proc splits into
    near-equal groups of <=5 (its XLA compile time blows up with vmapped
    member width — measured S=2 ~260s vs S=10 >570s on the TPU backend,
    the root cause of the historical 10x4000 'device errors'); cvs and
    challenge never group; grouped dispatches are bit-exact with a single
    dispatch (verified on a live 4-seed sweep, --member-group 2 vs 0)."""
    from structured_latent_odes_tpu.sweep import member_group_size

    assert member_group_size("cvs", 128) == 0
    assert member_group_size("challenge", 8) == 0
    assert member_group_size("proc", 5) == 0      # fits one dispatch
    assert member_group_size("proc", 8) == 4      # 2 equal groups, 1 compile
    assert member_group_size("proc", 10) == 5     # 2 equal groups
    assert member_group_size("proc", 12) == 4     # 3 equal groups
    assert member_group_size("proc", 11) == 4     # 4+4+3 (last recompiles)


def test_select_member_converged_epoch_guard():
    """select_member picks the criterion argmin among converged members only.

    Regression for the two observed failure decades (RESULTS.md
    'Best-of-ensemble selection'): a member whose val-ELBO peaked mid
    warm-up transient (best_epoch < lr_decay_start) must not win on its
    non-comparable criterion; with no converged member, fall back to the
    unguarded argmin rather than failing.
    """
    from structured_latent_odes_tpu.sweep import select_member

    members = [
        {"seed": 44, "criterion": -783.98, "best_epoch": 1246},  # transient spike
        {"seed": 48, "criterion": -780.78, "best_epoch": 4935},
        {"seed": 43, "criterion": -770.35, "best_epoch": 4999},
    ]
    assert select_member(members)["seed"] == 44  # unguarded argmin
    assert select_member(members)["guard_fallback"] is False
    assert select_member(members, min_best_epoch=2000)["seed"] == 48
    # nobody converged -> fall back to global argmin, LOUDLY
    fb = select_member(members, min_best_epoch=5000)
    assert fb["seed"] == 44
    assert fb["guard_fallback"] is True


def test_select_member_prior_rank_combine():
    """With sel_prior_l1 present, selection rank-combines criterion and the
    selection-split prior L1 (criterion breaks rank-sum ties).

    Regression for the round-3 blind proc miss
    (runs_evidence/r3/proc_blind_sel.sweep.json): seed 46 dominated seed 44
    on both test metrics, yet 44 won the criterion argmin; the rank-combine
    must prefer 46. Members without the field (pre-round-4 sweep.json) keep
    the criterion-argmin behavior.
    """
    from structured_latent_odes_tpu.sweep import select_member

    # criteria/priors from the actual blind sweep (sel_prior_l1 stands in
    # for the selection-split signal, same ordering)
    members = [
        {"seed": 42, "criterion": -1509.9, "best_epoch": 3846, "sel_prior_l1": 16.2},
        {"seed": 43, "criterion": -890.5, "best_epoch": 1917, "sel_prior_l1": 18.9},
        {"seed": 44, "criterion": -1824.7, "best_epoch": 3470, "sel_prior_l1": 17.3},
        {"seed": 45, "criterion": -1521.1, "best_epoch": 2027, "sel_prior_l1": 16.0},
        {"seed": 46, "criterion": -1564.4, "best_epoch": 3015, "sel_prior_l1": 14.4},
    ]
    picked = select_member(members)
    assert picked["seed"] == 46  # rank-sum 1+0 beats 44's 0+3
    assert picked["guard_fallback"] is False

    # missing sel_prior_l1 on ANY member -> criterion argmin (old sweeps)
    legacy = [dict(m) for m in members]
    del legacy[0]["sel_prior_l1"]
    assert select_member(legacy)["seed"] == 44

    # criterion breaks rank-sum ties: two members with swapped ranks (priors
    # within the veto margin so both survive to the rank-combine)
    tied = [
        {"seed": 1, "criterion": -10.0, "best_epoch": 0, "sel_prior_l1": 1.04},
        {"seed": 2, "criterion": -5.0, "best_epoch": 0, "sel_prior_l1": 1.0},
    ]
    assert select_member(tied)["seed"] == 1


def test_select_member_prior_veto():
    """The prior veto excludes criterion-dominant members whose selection
    prior lags the pool best by >margin before the rank-combine.

    Fixture = the REAL member table of
    runs_evidence/r4/chal_priorlr5_confirm.sweep.json (challenge fold 5,
    seeds 76..83, prior_lr_mult=5): pure rank addition selected seed 77
    (criterion argmin, sel_prior_l1 9.1% above pool best) whose TEST prior
    L1 was 47.02 vs the 38.969 published anchor
    (/root/reference/challenge_eval_folds.ipynb cell 5), while seeds
    78/81/82/83 clustered within 1e-4 of the best selection prior and sat
    at test prior 37.2-37.4.  The veto must exclude 77 and pick one of the
    tight-prior members (rank-combine among survivors -> seed 81).
    """
    from structured_latent_odes_tpu.sweep import select_member

    # (seed, best_epoch, criterion, sel_prior_l1, test l1_prior) — verbatim
    # from the archived sweep.json; test prior is carried only to assert the
    # anchor outcome, selection never reads it.
    table = [
        (76, 2960, -179.14395141601562, 0.10611833206244878, 34.916),
        (77, 2669, -187.3263397216797, 0.10744563277278628, 47.016),
        (78, 2321, -114.74549865722656, 0.09848612759794508, 37.187),
        (79, 2890, -184.40945434570312, 0.1342697420290538, 50.561),
        (80, 2819, -174.3009490966797, 0.1303669661283493, 47.823),
        (81, 2989, -129.0285186767578, 0.09846292436122894, 37.268),
        (82, 2816, -126.55529022216797, 0.0985011298741613, 37.429),
        (83, 2754, -115.94084930419922, 0.09844906202384404, 37.299),
    ]
    members = [
        {
            "seed": s,
            "best_epoch": be,
            "criterion": c,
            "sel_prior_l1": sp,
            "l1_prior": pr,
        }
        for (s, be, c, sp, pr) in table
    ]
    picked = select_member(members, min_best_epoch=2000)
    # seeds 76/77/79/80 (prior >5% above best) vetoed; rank-combine among
    # the tight-prior survivors 78/81/82/83 -> 81 (best criterion among them
    # + 2nd-best prior); its test prior 37.268 beats the 38.969 anchor the
    # unvetoed rule missed by 8 L1 points.
    assert picked["n_prior_vetoed"] == 4
    assert picked["seed"] == 81
    assert picked["l1_prior"] < 38.969

    # the old argmin pick must be among the vetoed, not merely out-ranked
    survivors_cutoff = min(t[3] for t in table) * 1.05
    assert members[1]["sel_prior_l1"] > survivors_cutoff

    # margin is a knob: an infinite margin reproduces the old rank-combine
    # (and with it the documented failure — selects seed 77)
    legacy_pick = select_member(members, min_best_epoch=2000,
                                prior_veto_margin=float("inf"))
    assert legacy_pick["seed"] == 77 and legacy_pick["l1_prior"] > 38.969

    # veto_pool (the averaged-deployment filter) mirrors select_member's
    # guard+veto exactly on this fixture: survivors are the tight-prior
    # members, with the guard knocking out 78 (best_epoch 2321 >= 2000 ok —
    # all pass the guard here) — i.e. the same 4 seeds the rule vetoes
    from structured_latent_odes_tpu.sweep import veto_pool

    pool = veto_pool(members, min_best_epoch=2000, margin=0.05)
    assert sorted(m["seed"] for m in pool) == [78, 81, 82, 83]
    assert len(members) - len(pool) == picked["n_prior_vetoed"]
