"""Training-infrastructure tests: checkpointing, artifacts, eval metrics,
profiling, variance-gaussian decoder."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structured_latent_odes_tpu.nn.decoders import DecoderSpec, decoder_apply, decoder_init
from structured_latent_odes_tpu.nn.ode_model import OdeModelSpec
from structured_latent_odes_tpu.train import artifacts, checkpoint
from structured_latent_odes_tpu.utils.profiling import StepTimer


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "a": {"W": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},
        "c": [jnp.ones((4,)), jnp.full((2, 2), 7.0)],
    }
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, tree, metadata={"epoch": 5})
    restored = checkpoint.restore(path, tree)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
        assert np.array_equal(a, b)
    assert checkpoint.load_metadata(path)["epoch"] == 5


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    tree = {"W": jnp.zeros((2, 3))}
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, tree)
    with pytest.raises(ValueError):
        checkpoint.restore(path, {"W": jnp.zeros((3, 3))})


def test_artifact_contract_filenames(tmp_path):
    out = str(tmp_path)
    rng = np.random.RandomState(0)
    artifacts.dump_common(out, rng.rand(5, 3, 7), np.arange(7.0), {"iext": np.ones(5)})
    recon = {
        "mu_50": rng.rand(5, 3, 7),
        "mu_75": rng.rand(5, 3, 7),
        "mu_25": rng.rand(5, 3, 7),
        "solution_xt": rng.rand(5, 7, 4),
        "z": rng.rand(5, 15),
    }
    artifacts.dump_recon(out, "post", recon)
    artifacts.dump_sample_bands(out, "post", rng.rand(5, 3, 7, 2), rng.rand(5, 3, 7, 2), rng.rand(5, 3, 7, 2))
    expected = {
        "observations.npy", "times.npy", "iext.npy",
        "mu_50_post.npy", "mu_75_post.npy", "mu_25_post.npy",
        "solution_xt_post.npy", "z_post.npy",
        "mu_25_post_sample.npy", "mu_50_post_sample.npy", "mu_75_post_sample.npy",
    }
    assert expected <= set(os.listdir(out))


def test_eval_metrics_on_synthetic_artifacts(tmp_path):
    """A perfect prediction must give exactly zero aggregate L1."""
    out = str(tmp_path)
    rng = np.random.RandomState(1)
    y = rng.rand(8, 4, 10).astype(np.float32)
    shedding = (rng.rand(8) > 0.5).astype(np.float32)
    symptoms = (rng.rand(8) > 0.5).astype(np.float32)
    artifacts.dump_common(out, y, np.arange(10.0), {"shedding": shedding, "symptoms": symptoms})
    recon = {"mu_50": y, "mu_75": y, "mu_25": y, "solution_xt": y, "z": y[:, 0]}
    artifacts.dump_recon(out, "post", recon)

    from structured_latent_odes_tpu.eval import challenge_outcome_averaged_l1

    assert challenge_outcome_averaged_l1(out, "post") == 0.0


def test_variance_gaussian_decoder_runs():
    """The reference's dead-code decoder variant works here (C2 parity)."""
    ode = OdeModelSpec(latent_dim=6, ode_state_dim=4, ode_hidden_dim=8)
    spec = DecoderSpec(kind="variance_gaussian", ode=ode, obs_dim=3, n_time=12)
    params = decoder_init(jax.random.key(0), spec)
    z = jax.random.normal(jax.random.key(1), (5, 6))
    sol, mean, std = decoder_apply(spec, params, z, jnp.arange(12.0))
    assert sol.shape == (5, 12, 4) and mean.shape == (5, 3, 12) and std.shape == (5, 3, 12)


def test_step_timer():
    timer = StepTimer(warmup=1)
    x = jnp.ones(4)
    f = jax.jit(lambda x: x * 2)
    for _ in range(4):
        with timer:
            out = f(x)
        timer.sync(out)
    s = timer.summary()
    assert s["steps"] == 3 and s["steps_per_sec"] > 0


def test_eval_figures_smoke(tmp_path):
    out = str(tmp_path)
    rng = np.random.RandomState(2)
    y = rng.rand(10, 3, 8).astype(np.float32)
    artifacts.dump_common(
        out, y, np.arange(8.0),
        {"iext": (rng.rand(10) > 0.5).astype(np.float32),
         "rtpr": (rng.rand(10) > 0.5).astype(np.float32)},
    )
    artifacts.dump_recon(out, "post", {"mu_50": y, "mu_75": y + 0.1, "mu_25": y - 0.1,
                                       "solution_xt": y, "z": y[:, 0]})
    from structured_latent_odes_tpu.eval import figures

    p = figures.class_averaged_bands(out, "post", ("iext", "rtpr"), ("a", "b", "c"), "bands.png")
    assert os.path.exists(p)


def test_checkpoint_structure_mismatch_rejected(tmp_path):
    """Same leaf shapes in different structural positions must NOT restore
    silently — the first differing key path is named (VERDICT r1 weak #8)."""
    tree = {"a": {"x": jnp.zeros(3)}, "b": {"y": jnp.ones(3)}}
    path = str(tmp_path / "s.npz")
    checkpoint.save(path, tree)
    swapped = {"a": {"y": jnp.zeros(3)}, "b": {"x": jnp.ones(3)}}
    with pytest.raises(ValueError, match="structure mismatch"):
        checkpoint.restore(path, swapped)
    # superset structure is rejected too
    with pytest.raises(ValueError):
        checkpoint.restore(path, {"a": {"x": jnp.zeros(3)}, "b": {"y": jnp.ones(3)}, "c": jnp.zeros(1)})


def test_host_rng_tree_roundtrip():
    rng = np.random.RandomState(7)
    rng.rand(13)
    snap = checkpoint.host_rng_tree(rng)
    expected = rng.rand(5)
    rng2 = np.random.RandomState(0)
    checkpoint.apply_host_rng_tree(rng2, snap)
    np.testing.assert_array_equal(rng2.rand(5), expected)


def _tiny_cvs_training(tmp_path, num_epochs, checkpoint_every=0, resume=False):
    from structured_latent_odes_tpu.data.configs import load_cvs_config
    from structured_latent_odes_tpu.models import cvs_spec, init_params
    from structured_latent_odes_tpu.train.driver import run_training_epochs
    from structured_latent_odes_tpu.train.svi import make_eval_fns, make_train_step

    T = 16
    config = load_cvs_config()
    config.seq_len = T
    config.mini_batch_size = 4
    config.num_epochs = num_epochs

    def split(n, seed):
        r = np.random.RandomState(seed)
        return {
            "observations": r.rand(n, 3, T).astype(np.float32),
            "iext": (r.rand(n, 1) > 0.5).astype(np.float32),
            "rtpr": (r.rand(n, 1) > 0.5).astype(np.float32),
        }

    splits = {"train": split(10, 0), "val": split(6, 1), "test": split(6, 2)}
    spec = cvs_spec(config, n_time=T)
    params = init_params(jax.random.key(0), spec)
    ts = jnp.arange(float(T))
    init_state, train_step, train_epoch = make_train_step(spec, ts, 1e-3, params)
    state = init_state(jax.tree.map(jnp.copy, params), jax.random.key(1))
    eval_fns = make_eval_fns(spec, ts)

    def select_best(epoch, val, train_s, best, params_now, epoch_losses):
        val_elbo = float(np.sum(val["post"].elbo))
        if best["criterion"] >= val_elbo:
            return {"params": params_now, "epoch": epoch, "criterion": val_elbo}
        return best

    state, best = run_training_epochs(
        spec=spec,
        state=state,
        train_step=train_step,
        eval_fns=eval_fns,
        splits=splits,
        config=config,
        rng=np.random.RandomState(config.seed),
        eval_key=jax.random.key(2),
        select_best=select_best,
        eval_train_stats=False,
        train_epoch=train_epoch,
        checkpoint_path=str(tmp_path / "resume_ckpt.npz"),
        checkpoint_every=checkpoint_every,
        resume=resume,
    )
    return state


@pytest.mark.slow
def test_resume_is_batch_exact(tmp_path):
    """A run checkpointed at epoch 2 and resumed to epoch 4 must produce
    bit-identical parameters to an uninterrupted 4-epoch run: the host
    shuffle RNG, eval key, and device key are all restored, and per-sample
    RNG keying removes any batch-composition dependence."""
    state_full = _tiny_cvs_training(tmp_path, num_epochs=4, checkpoint_every=2)

    _tiny_cvs_training(tmp_path, num_epochs=2, checkpoint_every=2)
    state_resumed = _tiny_cvs_training(
        tmp_path, num_epochs=4, checkpoint_every=0, resume=True
    )

    for a, b in zip(
        jax.tree.leaves(state_full.params), jax.tree.leaves(state_resumed.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_prng_key_roundtrip(tmp_path):
    """Typed PRNG keys (SVIState.key) survive save/restore."""
    key = jax.random.key(42)
    tree = {"key": key, "w": jnp.ones(3)}
    path = str(tmp_path / "k.npz")
    checkpoint.save(path, tree)
    restored = checkpoint.restore(path, tree)
    assert jnp.array_equal(
        jax.random.key_data(restored["key"]), jax.random.key_data(key)
    )
    # usable for sampling
    jax.random.normal(restored["key"], (2,))


def test_c22_figures_smoke(tmp_path):
    """Latent-dynamics panels + per-subject renormalized trajectories render
    from the artifact contract (cvs_eval_final / _subject_final notebooks)."""
    out = str(tmp_path)
    rng = np.random.RandomState(3)
    y = rng.rand(6, 4, 9).astype(np.float32)
    artifacts.dump_common(
        out, y, np.arange(9.0),
        {"shedding": (rng.rand(6) > 0.5).astype(np.float32),
         "symptoms": (rng.rand(6) > 0.5).astype(np.float32)},
    )
    artifacts.dump_recon(out, "post", {
        "mu_50": y, "mu_75": y + 0.1, "mu_25": y - 0.1,
        "solution_xt": rng.rand(6, 9, 5).astype(np.float32), "z": y[:, 0],
    })
    from structured_latent_odes_tpu.eval import figures

    p1 = figures.latent_dynamics_panels(out, "post", ("shedding", "symptoms"), "ld.png")
    p2 = figures.per_subject_trajectories(
        out, "post", ("shedding", "symptoms"), ("HR", "TEMP", "EDA", "ACC"), "subj.png"
    )
    assert os.path.exists(p1) and os.path.exists(p2)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """The orbax-backed production checkpoint path round-trips a pytree."""
    pytest.importorskip("orbax.checkpoint")
    tree = {"w": jnp.arange(4.0), "nested": {"b": jnp.ones((2, 2))}}
    path = str(tmp_path / "orbax_ckpt")
    checkpoint.save_orbax(path, tree)
    restored = checkpoint.restore_orbax(path, tree)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_eval_split_batch_size_invariant():
    """eval_split recon outputs and label metrics are identical for any eval
    batch size (per-split site keys + per-sample RNG ids)."""
    from structured_latent_odes_tpu.data.configs import load_cvs_config
    from structured_latent_odes_tpu.models import cvs_spec, init_params
    from structured_latent_odes_tpu.train.driver import eval_split
    from structured_latent_odes_tpu.train.svi import make_eval_fns

    T = 16
    config = load_cvs_config()
    config.seq_len = T
    spec = cvs_spec(config, n_time=T)
    params = init_params(jax.random.key(0), spec)
    r = np.random.RandomState(5)
    split = {
        "observations": r.rand(10, 3, T).astype(np.float32),
        "iext": (r.rand(10, 1) > 0.5).astype(np.float32),
        "rtpr": (r.rand(10, 1) > 0.5).astype(np.float32),
    }
    eval_fns = make_eval_fns(spec, jnp.arange(float(T)))
    key = jax.random.key(9)
    s_full = eval_split(spec, params, key, split, eval_fns, 10, is_post=True)
    s_small = eval_split(spec, params, key, split, eval_fns, 4, is_post=True)
    np.testing.assert_allclose(
        s_small.recon["mu_50"], s_full.recon["mu_50"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(s_small.recon["z"], s_full.recon["z"], rtol=1e-5, atol=1e-6)
    assert s_small.label_metrics == s_full.label_metrics


@pytest.mark.parametrize(
    "is_post", [True, pytest.param(False, marks=pytest.mark.slow)]
)
def test_fused_eval_epoch_matches_host_loop(is_post):
    """make_eval_epoch (one fused dispatch per split/mode) reproduces the
    eval_split host loop's elbo / l1 / label metrics — same RNG keying, so
    best-model selection under the fast path is unchanged."""
    from structured_latent_odes_tpu.data.configs import load_cvs_config
    from structured_latent_odes_tpu.data.loader import stacked_minibatches
    from structured_latent_odes_tpu.models import cvs_spec, init_params
    from structured_latent_odes_tpu.train.driver import _stats_from_fused, eval_split
    from structured_latent_odes_tpu.train.svi import make_eval_epoch, make_eval_fns

    T, bs = 16, 4
    config = load_cvs_config()
    config.seq_len = T
    spec = cvs_spec(config, n_time=T)
    params = init_params(jax.random.key(0), spec)
    r = np.random.RandomState(5)
    split = {
        "observations": r.rand(10, 3, T).astype(np.float32),
        "iext": (r.rand(10, 1) > 0.5).astype(np.float32),
        "rtpr": (r.rand(10, 1) > 0.5).astype(np.float32),
    }
    ts = jnp.arange(float(T))
    key = jax.random.key(9)

    loop = eval_split(
        spec, params, key, split, make_eval_fns(spec, ts), bs, is_post=is_post
    )
    stack = {k: jnp.asarray(v) for k, v in stacked_minibatches(split, bs, shuffle=False).items()}
    fused = _stats_from_fused(
        spec, make_eval_epoch(spec, ts)(params, key, stack, is_post)
    )

    np.testing.assert_allclose(fused.elbo, loop.elbo, rtol=2e-5)
    np.testing.assert_allclose(fused.l1, loop.l1, rtol=2e-5)
    for name in loop.label_metrics:
        np.testing.assert_allclose(
            fused.label_metrics[name], loop.label_metrics[name], rtol=1e-6
        )


def test_cvs_ground_truth_metric(tmp_path):
    """Exact recovery of the noise-free ground truth scores zero; the metric
    consumes the generator's gt_test_obs (which the reference saves but never
    uses, SURVEY.md §4.3)."""
    from structured_latent_odes_tpu.data.transforms import NormalizeToUnitSegment
    from structured_latent_odes_tpu.eval.metrics import cvs_ground_truth_l1

    rng = np.random.RandomState(4)
    gt = rng.rand(6, 9, 3).astype(np.float32)  # (N, T, K)
    norm_params = {
        "mean": gt.mean((0, 1)), "std": gt.std((0, 1)),
        "min": gt.min((0, 1)), "max": gt.max((0, 1)),
    }
    npz = str(tmp_path / "cvs.npz")
    np.savez(
        npz, gt_test_obs=gt, test_obs=gt,
        **{f"norm_{k}": v for k, v in norm_params.items()},
    )

    out = str(tmp_path)
    gt_model = np.swapaxes(NormalizeToUnitSegment(norm_params)(gt), 1, 2)
    artifacts.dump_common(
        out, gt_model, np.arange(9.0),
        {"iext": (rng.rand(6) > 0.5).astype(np.float32),
         "rtpr": (rng.rand(6) > 0.5).astype(np.float32)},
    )
    artifacts.dump_recon(out, "post", {
        "mu_50": gt_model, "mu_75": gt_model, "mu_25": gt_model,
        "solution_xt": gt_model, "z": gt_model[:, 0],
    })
    assert cvs_ground_truth_l1(out, "post", npz) == 0.0

    # Misaligned data (a run trained on DIFFERENT data than this npz, e.g.
    # the upstream pickles) must be rejected — shapes alone can't catch it.
    other = rng.rand(6, 9, 3).astype(np.float32)
    npz2 = str(tmp_path / "cvs2.npz")
    np.savez(
        npz2, gt_test_obs=gt, test_obs=other,
        **{f"norm_{k}": v for k, v in norm_params.items()},
    )
    with pytest.raises(ValueError, match="different data"):
        cvs_ground_truth_l1(out, "post", npz2)
