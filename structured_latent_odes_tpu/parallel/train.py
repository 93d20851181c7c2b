"""Data-parallel SVI training over a device mesh (pjit-style).

The dual-loss train step from train/svi.py is re-jitted with explicit
shardings: parameters/optimizer state replicated (PartitionSpec()), every
batch array sharded on its leading axis over the ``data`` mesh axis. Because
the ELBO sums over the batch, XLA's SPMD partitioner inserts the gradient
all-reduce over ICI automatically — the TPU-native replacement for the
reference's (absent) NCCL/DataParallel layer (SURVEY.md §2, §5).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from structured_latent_odes_tpu.models import elbo_aux, elbo_main
from structured_latent_odes_tpu.models.spec import ModelSpec
from structured_latent_odes_tpu.parallel.mesh import replicated
from structured_latent_odes_tpu.train.svi import SVIState, make_optimizers


def make_dp_train_step(spec: ModelSpec, ts, lr: float, params_example, mesh: Mesh):
    """Returns (init_state_fn, sharded jitted train_step).

    train_step(state, batch) -> (state, metrics); batch arrays must be
    device-put with their leading axis sharded over ``data``
    (parallel.mesh.shard_batch).
    """
    ts = jnp.asarray(ts)
    opt_main, opt_aux = make_optimizers(spec, params_example, lr)
    repl = replicated(mesh)

    def init_state(params, key) -> SVIState:
        params = jax.device_put(params, repl)
        state = SVIState(params, opt_main.init(params), opt_aux.init(params), key)
        return jax.device_put(state, repl)

    def _step(state: SVIState, batch):
        key, k1, k2 = jax.random.split(state.key, 3)
        (loss_m, mets), grads = jax.value_and_grad(
            lambda p: elbo_main(spec, p, k1, batch, ts), has_aux=True
        )(state.params)
        updates, opt_main_state = opt_main.update(grads, state.opt_main, state.params)
        params = optax.apply_updates(state.params, updates)

        loss_a, grads_a = jax.value_and_grad(lambda p: elbo_aux(spec, p, k2, batch))(params)
        updates_a, opt_aux_state = opt_aux.update(grads_a, state.opt_aux, params)
        params = optax.apply_updates(params, updates_a)

        n = jnp.maximum(jnp.sum(batch["mask"]), 1.0)
        metrics = {"loss_main": loss_m / n, "loss_aux": loss_a / n, "l1": mets["l1"]}
        return SVIState(params, opt_main_state, opt_aux_state, key), metrics

    # Shardings propagate from operand placement: init_state replicates the
    # state, shard_batch shards the batch leading axis; GSPMD partitions the
    # step and inserts the ICI all-reduce for the replicated-param gradients.
    train_step = jax.jit(_step)
    return init_state, train_step


def make_dp_eval_step(spec: ModelSpec, ts, mesh: Mesh):
    ts = jnp.asarray(ts)

    @jax.jit
    def evaluate(params, key, batch) -> Tuple[jax.Array, jax.Array]:
        k1, k2 = jax.random.split(key)
        lm, _ = elbo_main(spec, params, k1, batch, ts)
        la = elbo_aux(spec, params, k2, batch)
        return lm, la

    return evaluate
