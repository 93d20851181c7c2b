"""SVI engine: dual-loss training step with per-loss masked Adam.

Replaces pyro.infer.SVI + pyro.optim.Adam (reference training loop,
/root/reference/training_cvs.py:226-266). The reference steps TWO SVI losses
sequentially per minibatch against one lazily-allocated per-parameter Adam;
here each loss gets an ``optax.masked(adam)`` over exactly the parameter
groups that loss structurally touches (models.slode.param_masks), preserving
Pyro's update semantics (a parameter's moments/step-count only advance when
its loss runs). The whole dual update compiles into ONE XLA executable.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from structured_latent_odes_tpu.models import (
    classifier,
    elbo_aux,
    elbo_main,
    param_masks,
    recon,
)
from structured_latent_odes_tpu.models.spec import ModelSpec

Array = jax.Array


class SVIState(NamedTuple):
    params: Any
    opt_main: Any
    opt_aux: Any
    key: Array


def make_optimizers(spec: ModelSpec, params, lr: float):
    main_mask, aux_mask = param_masks(spec, params)
    adam = lambda: optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    opt_main = optax.masked(adam(), main_mask)
    opt_aux = optax.masked(adam(), aux_mask)
    return opt_main, opt_aux


def make_dual_step(spec: ModelSpec, ts, opt_main, opt_aux, num_particles: int = 1):
    """The (unjitted) sequential dual-loss SVI update shared by the
    single-device and data-parallel paths."""
    ts = jnp.asarray(ts)

    def main_loss(params, key, batch):
        if num_particles == 1:
            return elbo_main(spec, params, key, batch, ts)
        keys = jax.random.split(key, num_particles)
        losses, mets = jax.vmap(lambda k: elbo_main(spec, params, k, batch, ts))(keys)
        return jnp.mean(losses), jax.tree.map(jnp.mean, mets)

    def aux_loss(params, key, batch):
        if num_particles == 1:
            return elbo_aux(spec, params, key, batch)
        keys = jax.random.split(key, num_particles)
        return jnp.mean(jax.vmap(lambda k: elbo_aux(spec, params, k, batch))(keys))

    def _step(state: SVIState, batch) -> Tuple[SVIState, Dict[str, Array]]:
        key, k1, k2 = jax.random.split(state.key, 3)
        (loss_m, mets), grads = jax.value_and_grad(main_loss, has_aux=True)(
            state.params, k1, batch
        )
        updates, opt_main_state = opt_main.update(grads, state.opt_main, state.params)
        params = optax.apply_updates(state.params, updates)

        loss_a, grads_a = jax.value_and_grad(aux_loss)(params, k2, batch)
        updates_a, opt_aux_state = opt_aux.update(grads_a, state.opt_aux, params)
        params = optax.apply_updates(params, updates_a)

        n = jnp.maximum(jnp.sum(batch["mask"]), 1.0)
        metrics = {"loss_main": loss_m / n, "loss_aux": loss_a / n, "l1": mets["l1"]}
        return SVIState(params, opt_main_state, opt_aux_state, key), metrics

    return _step


def make_train_step(spec: ModelSpec, ts, lr: float, params_example, num_particles: int = 1):
    """Returns (init_state_fn, jitted train_step, jitted train_epoch).

    train_step(state, batch) -> (state, metrics) where metrics carries both
    per-loss totals (the reference logs loss/batch_size per loss,
    training_cvs.py:147-157) and the in-model L1. ``num_particles`` averages
    that many reparameterized ELBO particles (Trace_ELBO(num_particles)
    semantics; the reference runs 1, config_cvs.py:47).
    """
    opt_main, opt_aux = make_optimizers(spec, params_example, lr)

    def init_state(params, key) -> SVIState:
        return SVIState(params, opt_main.init(params), opt_aux.init(params), key)

    _step = make_dual_step(spec, ts, opt_main, opt_aux, num_particles)

    train_step = jax.jit(_step, donate_argnums=0)

    @functools.partial(jax.jit, donate_argnums=0)
    def train_epoch(state: SVIState, batches) -> Tuple[SVIState, Dict[str, Array]]:
        """Run a whole epoch of stacked minibatches in ONE dispatch.

        ``batches``: dict of arrays with leading (n_batches, B, ...) axes.
        TPU-idiomatic: these datasets are tiny, so an entire epoch scans on
        device — per-step host dispatch (the dominant cost at this model
        size, especially over a remote-tunnel TPU) is paid once per epoch.
        Returns per-step metrics stacked along the leading axis.
        """
        return jax.lax.scan(_step, state, batches)

    return init_state, train_step, train_epoch


def make_eval_fns(spec: ModelSpec, ts):
    """Jitted eval-only functions: per-loss ELBO evaluation (SVI.evaluate_loss),
    classifier predictions, posterior/prior reconstruction."""
    ts = jnp.asarray(ts)

    @jax.jit
    def evaluate_losses(params, key, batch):
        k1, k2 = jax.random.split(key)
        loss_m, _ = elbo_main(spec, params, k1, batch, ts)
        loss_a = elbo_aux(spec, params, k2, batch)
        return loss_m, loss_a

    @jax.jit
    def classify(params, key, obs):
        return classifier(spec, params, key, obs)

    @functools.partial(jax.jit, static_argnames=("is_post",))
    def reconstruct(params, key, batch, is_post: bool):
        return recon(spec, params, key, batch, ts, is_post)

    return evaluate_losses, classify, reconstruct
