"""Training-backend selection: single-device vs data-parallel mesh.

The reference trains strictly single-process (SURVEY.md §2); here
``--data-parallel N`` lifts the SAME dual-SVI step onto an N-device
``jax.sharding`` mesh (params replicated, batch axis sharded, gradient
all-reduce over ICI inserted by GSPMD) — tested bit-comparable to the
single-device path on a virtual 8-CPU mesh (tests/test_parallel.py).
"""

from __future__ import annotations

import jax

from structured_latent_odes_tpu.models.spec import ModelSpec
from structured_latent_odes_tpu.train.svi import make_train_step

# The time-sharding context THIS module installed for the previous run (the
# unscoped set_time_sharding form has process lifetime). Tracked so a later
# in-process run can't silently reuse a stale mesh: each backend build clears
# a context it installed itself — but never one a user installed via the
# scoped parallel.timepar.time_sharding(...) manager (different object).
_installed_time_ctx = None


def _reset_stale_time_ctx():
    global _installed_time_ctx
    from structured_latent_odes_tpu.parallel import timepar

    if (
        _installed_time_ctx is not None
        and timepar.current_time_sharding() is _installed_time_ctx
    ):
        timepar.clear_time_sharding()
    _installed_time_ctx = None


def make_training_backend(spec: ModelSpec, times, config, params):
    """Returns (init_state, train_step, train_epoch, put_batch).

    ``put_batch`` moves a host batch dict to device(s): plain device_put for
    single-device, sharded over the mesh's ``data`` axis when
    ``config.data_parallel`` > 1 (works for both per-minibatch and stacked
    whole-epoch layouts, keyed on the mask's rank).
    """
    global _installed_time_ctx
    _reset_stale_time_ctx()
    dp = int(config.get("data_parallel") or 0)
    tp = int(config.get("time_parallel") or 0)
    num_particles = config.get("num_particles", 1)
    optimizer = config.get("optimizer", "shared")
    prior_lr_mult = float(config.get("prior_lr_mult") or 1.0)
    if dp > 1 or tp > 1:
        from structured_latent_odes_tpu.parallel.mesh import (
            make_mesh,
            shard_batch,
            shard_stacked,
        )
        from structured_latent_odes_tpu.parallel.train import make_dp_train_step

        dp = max(dp, 1)
        tp = max(tp, 1)
        n_dev = len(jax.devices())
        if dp * tp > n_dev:
            raise ValueError(
                f"--data-parallel {dp} x --time-parallel {tp} > {n_dev} "
                "available devices"
            )
        if config.mini_batch_size % dp:
            raise ValueError(
                f"mini_batch_size {config.mini_batch_size} not divisible by "
                f"--data-parallel {dp}"
            )
        mesh = make_mesh(n_data=dp, n_model=tp)
        if tp > 1:
            # sequence parallelism: the model spec carries
            # backend='semilinear_timepar' (models/zoo.py) and every jit
            # trace for this run — train, eval, recon — reads the mesh from
            # the ambient context
            from structured_latent_odes_tpu.parallel import timepar

            timepar.set_time_sharding(mesh, time_axis="model", batch_axis="data")
            _installed_time_ctx = timepar.current_time_sharding()
        init_state, train_step, train_epoch = make_dp_train_step(
            spec, times, config.learning_rate, params, mesh,
            num_particles=num_particles, optimizer=optimizer,
            prior_lr_mult=prior_lr_mult,
        )

        def put_batch(b):
            if b["mask"].ndim == 2:  # stacked epoch (n_batches, B, ...)
                return shard_stacked(mesh, b)
            return shard_batch(mesh, b)

        return init_state, train_step, train_epoch, put_batch

    init_state, train_step, train_epoch = make_train_step(
        spec, times, config.learning_rate, params,
        num_particles=num_particles, optimizer=optimizer,
        prior_lr_mult=prior_lr_mult,
    )
    return init_state, train_step, train_epoch, None
