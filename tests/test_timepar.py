"""Sequence-parallel (time-sharded) ODE solve tests on the 8-CPU mesh.

Checks the blocked prefix scan (parallel/timepar.py) — forward, gradients,
the model-backend hookup, and a full dual-loss train step on a 2-D
(data x time) mesh — against the single-device semilinear path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structured_latent_odes_tpu.data.configs import load_cvs_config
from structured_latent_odes_tpu.models import cvs_spec, init_params
from structured_latent_odes_tpu.nn.ode_model import (
    OdeModelSpec,
    dynamics_prod_degr,
    ode_model_init,
    solve_ode,
)
from structured_latent_odes_tpu.ode.semilinear import solve_affine_recurrence
from structured_latent_odes_tpu.parallel.mesh import make_mesh, shard_batch
from structured_latent_odes_tpu.parallel.timepar import (
    solve_affine_recurrence_timepar,
    solve_semilinear_timepar,
    time_sharding,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _mesh_2d(n_data=2, n_time=4):
    return make_mesh(n_data=n_data, n_model=n_time)


@pytest.mark.parametrize("t_steps", [21, 32])  # ragged and divisible horizons
def test_affine_recurrence_timepar_matches_single(t_steps):
    rng = np.random.RandomState(0)
    B, D = 6, 3
    A = jnp.asarray(rng.uniform(0.9, 1.1, (B, t_steps, D)).astype(np.float32))
    Bc = jnp.asarray(rng.randn(B, t_steps, D).astype(np.float32))
    x0 = jnp.asarray(rng.randn(B, D).astype(np.float32))

    ref = solve_affine_recurrence(A, Bc, x0, time_axis=1)
    mesh = _mesh_2d()
    out = jax.jit(
        lambda a, b, x: solve_affine_recurrence_timepar(
            a, b, x, mesh=mesh, time_axis="model", batch_axis=None
        )
    )(A, Bc, x0)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # batch-sharded variant (2-D data x time layout) must agree too
    out2 = jax.jit(
        lambda a, b, x: solve_affine_recurrence_timepar(
            a, b, x, mesh=mesh, time_axis="model", batch_axis="data"
        )
    )(A, Bc, x0)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_semilinear_timepar_full_solve_and_grads():
    """The in-shard dynamics-eval + scan path equals the single-device solve,
    forward and backward (params gradients)."""
    spec = OdeModelSpec(latent_dim=15, ode_state_dim=5, ode_hidden_dim=25)
    params = ode_model_init(jax.random.key(0), spec)
    z = jax.random.normal(jax.random.key(1), (8, 15))
    ts = jnp.arange(0.0, 23.0)  # T-1 = 22, ragged over 4 time shards
    mesh = _mesh_2d()

    from structured_latent_odes_tpu.nn.ode_model import initialize_state

    def single(params):
        sol = solve_ode(spec, params, z, ts)
        return (sol**2).sum(), sol

    def timepar(params):
        x0 = initialize_state(params, z)
        sol = solve_semilinear_timepar(
            dynamics_prod_degr, params, z, x0, ts,
            mesh=mesh, time_axis="model", batch_axis=None,
        )
        return (sol**2).sum(), sol

    (l1, s1), g1 = jax.value_and_grad(single, has_aux=True)(params)
    (l2, s2), g2 = jax.jit(jax.value_and_grad(timepar, has_aux=True))(params)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4)


def test_model_backend_semilinear_timepar():
    """spec.backend='semilinear_timepar' + ambient time_sharding context
    reproduces the default backend's trajectories."""
    base = OdeModelSpec(latent_dim=15, ode_state_dim=5, ode_hidden_dim=25)
    tp = OdeModelSpec(
        latent_dim=15, ode_state_dim=5, ode_hidden_dim=25, backend="semilinear_timepar"
    )
    params = ode_model_init(jax.random.key(0), base)
    z = jax.random.normal(jax.random.key(1), (8, 15))
    ts = jnp.arange(0.0, 17.0)
    mesh = _mesh_2d()

    ref = solve_ode(base, params, z, ts)
    with time_sharding(mesh, time_axis="model", batch_axis=None):
        out = jax.jit(lambda p, zz: solve_ode(tp, p, zz, ts))(params, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    with pytest.raises(RuntimeError, match="time_sharding"):
        solve_ode(tp, params, z, ts)


@pytest.mark.slow
def test_timepar_composes_with_particle_vmap():
    """--num-particles > 1 vmaps the ELBO over particles; the timepar solve
    (shard_map inside) must batch correctly under that vmap."""
    tp = OdeModelSpec(
        latent_dim=15, ode_state_dim=5, ode_hidden_dim=25, backend="semilinear_timepar"
    )
    base = OdeModelSpec(latent_dim=15, ode_state_dim=5, ode_hidden_dim=25)
    params = ode_model_init(jax.random.key(0), base)
    z = jax.random.normal(jax.random.key(1), (3, 8, 15))  # (particles, B, L)
    ts = jnp.arange(0.0, 17.0)
    ref = jax.vmap(lambda zz: solve_ode(base, params, zz, ts))(z)
    mesh = _mesh_2d()
    with time_sharding(mesh, time_axis="model", batch_axis=None):
        out = jax.jit(jax.vmap(lambda zz: solve_ode(tp, params, zz, ts)))(z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_backend_clears_stale_time_ctx():
    """A --time-parallel run installs a process-global mesh context; the NEXT
    in-process backend build must not silently inherit it (ADVICE r2) — while
    a user-scoped time_sharding context must survive backend builds."""
    from structured_latent_odes_tpu.parallel import timepar
    from structured_latent_odes_tpu.train.backend import make_training_backend

    T = 16
    config = load_cvs_config()
    config.seq_len = T
    config.time_parallel = 4
    config.data_parallel = 2
    config.ode_backend = "semilinear_timepar"
    spec_tp = cvs_spec(config, n_time=T)
    params = init_params(jax.random.key(0), spec_tp)
    ts = jnp.arange(float(T))

    make_training_backend(spec_tp, ts, config, params)
    assert timepar.current_time_sharding() is not None

    config2 = load_cvs_config()
    config2.seq_len = T
    spec_sd = cvs_spec(config2, n_time=T)
    make_training_backend(spec_sd, ts, config2, params)
    assert timepar.current_time_sharding() is None, "stale mesh ctx leaked"

    # user-scoped ambient context is NOT this module's to clear
    with time_sharding(_mesh_2d(), time_axis="model", batch_axis=None):
        user_ctx = timepar.current_time_sharding()
        make_training_backend(spec_sd, ts, config2, params)
        assert timepar.current_time_sharding() is user_ctx


def test_time_parallel_rejects_conflicting_backend():
    config = load_cvs_config()
    config.time_parallel = 2
    config.ode_backend = "adaptive"
    with pytest.raises(ValueError, match="time-parallel"):
        cvs_spec(config, n_time=16)


@pytest.mark.slow
def test_cvs_driver_time_parallel(tmp_path):
    """The CVS CLI trains end to end with --time-parallel (sequence
    parallelism over the mesh's time axis) composed with --data-parallel."""
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
            "--data-parallel", "2",
            "--time-parallel", "4",
            "--no-plot",
            "--no-eval-train",
        ]
    )
    assert np.isfinite(out["test_post"].l1)


@pytest.mark.slow
@pytest.mark.parametrize("num_particles", [1, 2])
def test_train_step_2d_mesh_matches_single_device(num_particles):
    """Full dual-loss SVI step on a (data=2, time=4) mesh — batch sharded
    over 'data', the ODE horizon sequence-parallel over 'model' — matches the
    single-device step's loss and updated params. ``num_particles=2`` covers
    the production composition --num-particles with --data-parallel: the
    particle vmap wraps a shard_map whose batch is sharded over 'data'."""
    from structured_latent_odes_tpu.parallel.train import make_dp_train_step
    from structured_latent_odes_tpu.train.svi import make_train_step

    T, B = 16, 8
    config = load_cvs_config()
    config.seq_len = T
    spec_sd = cvs_spec(config, n_time=T)
    config.ode_backend = "semilinear_timepar"
    spec_tp = cvs_spec(config, n_time=T)

    params = init_params(jax.random.key(0), spec_sd)
    rng = np.random.RandomState(0)
    batch = {
        "observations": rng.rand(B, 3, T).astype(np.float32),
        "iext": (rng.rand(B, 1) > 0.5).astype(np.float32),
        "rtpr": (rng.rand(B, 1) > 0.5).astype(np.float32),
        "mask": np.ones((B,), dtype=np.float32),
    }
    ts = jnp.arange(float(T))

    init_sd, step_sd, _ = make_train_step(
        spec_sd, ts, 1e-3, params, num_particles=num_particles
    )
    state_sd = init_sd(jax.tree.map(jnp.copy, params), jax.random.key(7))
    state_sd, m_sd = step_sd(state_sd, {k: jnp.asarray(v) for k, v in batch.items()})

    mesh = _mesh_2d(n_data=2, n_time=4)
    with time_sharding(mesh, time_axis="model", batch_axis="data"):
        init_tp, step_tp, _ = make_dp_train_step(
            spec_tp, ts, 1e-3, params, mesh, num_particles=num_particles
        )
        state_tp = init_tp(jax.tree.map(jnp.copy, params), jax.random.key(7))
        sb = shard_batch(mesh, batch)
        state_tp, m_tp = step_tp(state_tp, sb)

    np.testing.assert_allclose(
        float(m_tp["loss_main"]), float(m_sd["loss_main"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(state_sd.params), jax.tree.leaves(state_tp.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)
