"""Multi-device sharding tests on the virtual 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structured_latent_odes_tpu.data.configs import load_cvs_config
from structured_latent_odes_tpu.models import cvs_spec, init_params
from structured_latent_odes_tpu.parallel.mesh import (
    make_mesh,
    pad_batch_to_multiple,
    shard_batch,
)
from structured_latent_odes_tpu.parallel.train import make_dp_train_step
from structured_latent_odes_tpu.train.svi import make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _spec_and_batch(B=16, T=16):
    config = load_cvs_config()
    config.seq_len = T
    spec = cvs_spec(config, n_time=T)
    rng = np.random.RandomState(0)
    batch = {
        "observations": rng.rand(B, 3, T).astype(np.float32),
        "iext": (rng.rand(B, 1) > 0.5).astype(np.float32),
        "rtpr": (rng.rand(B, 1) > 0.5).astype(np.float32),
        "mask": np.ones((B,), dtype=np.float32),
    }
    return spec, config, batch


@pytest.mark.slow
def test_dp_train_step_runs_on_mesh():
    spec, config, batch = _spec_and_batch()
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    params = init_params(jax.random.key(0), spec)
    ts = jnp.arange(16.0)
    init_state, train_step, _ = make_dp_train_step(spec, ts, 1e-3, params, mesh)
    state = init_state(params, jax.random.key(1))
    sb = shard_batch(mesh, batch)
    # batch visibly sharded across devices
    assert len(sb["observations"].sharding.device_set) == 8
    state, mets = train_step(state, sb)
    assert np.isfinite(float(mets["loss_main"]))
    # params stay replicated after the update
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_dp_matches_single_device_loss():
    """The sharded step must compute the same loss/updates as single-device."""
    spec, config, batch = _spec_and_batch()
    params = init_params(jax.random.key(0), spec)
    ts = jnp.arange(16.0)

    mesh = make_mesh()
    init_dp, step_dp, _ = make_dp_train_step(spec, ts, 1e-3, params, mesh)
    state_dp = init_dp(params, jax.random.key(7))
    s1, m1 = step_dp(state_dp, shard_batch(mesh, batch))

    init_sd, step_sd, _ = make_train_step(spec, ts, 1e-3, params)
    state_sd = init_sd(params, jax.random.key(7))
    s2, m2 = step_sd(state_sd, {k: jnp.asarray(v) for k, v in batch.items()})

    assert np.allclose(float(m1["loss_main"]), float(m2["loss_main"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_pad_batch_to_multiple():
    _, _, batch = _spec_and_batch(B=13)
    out = pad_batch_to_multiple(batch, 8)
    assert out["observations"].shape[0] == 16
    assert out["mask"].sum() == 13


@pytest.mark.slow
def test_dp_epoch_scan_matches_single_device():
    """The DP whole-epoch scan (batch axis sharded over the mesh) equals the
    single-device epoch scan bit-for-bit given the same keys and data."""
    from structured_latent_odes_tpu.parallel.mesh import shard_stacked

    spec, _config, _b = _spec_and_batch()
    params = init_params(jax.random.key(0), spec)
    ts = jnp.arange(16.0)
    n_batches, B = 3, 8
    rng = np.random.RandomState(3)
    stacked = {
        "observations": rng.rand(n_batches, B, 3, 16).astype(np.float32),
        "iext": (rng.rand(n_batches, B, 1) > 0.5).astype(np.float32),
        "rtpr": (rng.rand(n_batches, B, 1) > 0.5).astype(np.float32),
        "mask": np.ones((n_batches, B), dtype=np.float32),
        "sample_id": np.tile(np.arange(B, dtype=np.int32), (n_batches, 1)),
    }

    from structured_latent_odes_tpu.train.svi import make_train_step

    init_sd, _, epoch_sd = make_train_step(spec, ts, 1e-3, params)
    state_sd = init_sd(jax.tree.map(jnp.copy, params), jax.random.key(2))
    state_sd, mets_sd = epoch_sd(state_sd, {k: jnp.asarray(v) for k, v in stacked.items()})

    mesh = make_mesh(n_data=8)
    from structured_latent_odes_tpu.parallel.train import make_dp_train_step

    init_dp, _, epoch_dp = make_dp_train_step(spec, ts, 1e-3, params, mesh)
    state_dp = init_dp(jax.tree.map(jnp.copy, params), jax.random.key(2))
    state_dp, mets_dp = epoch_dp(state_dp, shard_stacked(mesh, stacked))

    np.testing.assert_allclose(
        np.asarray(mets_dp["loss_main"]), np.asarray(mets_sd["loss_main"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(state_sd.params), jax.tree.leaves(state_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_cvs_driver_data_parallel(tmp_path):
    """The CVS CLI trains on an 8-device data-parallel mesh end to end."""
    import os

    from structured_latent_odes_tpu.data import cvs
    from structured_latent_odes_tpu.training_cvs import main

    data_dir = str(tmp_path / "data") + os.sep
    results_root = str(tmp_path / "results")
    os.makedirs(results_root, exist_ok=True)
    cvs.make_dataset(data_dir, data_size=30, seq_len=86, seed=0)

    out = main(
        [
            "--num-epochs", "1",
            "--data-path", data_dir,
            "--results-root", results_root,
            "--mini-batch-size", "16",
            "--data-parallel", "8",
            "--no-plot",
            "--no-eval-train",
        ]
    )
    assert np.isfinite(out["test_post"].l1)
