"""SVI engine: dual-loss training step with a SHARED per-parameter Adam.

Replaces pyro.infer.SVI + pyro.optim.Adam (reference training loop,
/root/reference/training_cvs.py:226-266). The reference steps TWO SVI losses
sequentially per minibatch against ONE ``pyro.optim.Adam`` — which lazily
builds one ``torch.optim.Adam`` *per parameter* and, on each ``SVI.step``,
advances only the parameters that received gradients from that loss. The
crucial consequence: a parameter touched by BOTH losses (the encoder
everywhere; the aux heads for proc where ``spec.aux_in_model``) accumulates
first/second moments from *both* gradient streams into the *same* Adam slots,
and its bias-correction step count advances on every touch.

``optimizer='shared'`` (default) reproduces exactly that: one set of
(mu, nu, count) slots per parameter; the main loss advances the slots of the
parameters it structurally touches (models.slode.param_masks), then the aux
loss advances its own set — shared parameters see both, in sequence, just
like torch.optim.Adam under Pyro. ``optimizer='split'`` keeps the round-1
behavior (two independent ``optax.masked(adam)`` chains) for controlled
comparisons. The whole dual update compiles into ONE XLA executable.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from structured_latent_odes_tpu.models import (
    classifier,
    elbo_aux,
    elbo_main,
    param_masks,
    recon,
)
from structured_latent_odes_tpu.models.spec import ModelSpec
from structured_latent_odes_tpu.utils.memo import BoundedMemo

Array = jax.Array


class SVIState(NamedTuple):
    params: Any
    opt: Any  # AdamSlots (shared) | (opt_main_state, opt_aux_state) (split)
    key: Array


class AdamSlots(NamedTuple):
    """Per-parameter Adam moments + per-parameter step counts (pytrees
    congruent with params). One set of slots serves both losses, matching
    Pyro's lazily-built per-param torch.optim.Adam instances."""

    mu: Any
    nu: Any
    count: Any  # int32 scalar per leaf


class DualOptimizer(NamedTuple):
    """Bundles state init + the two per-loss update rules."""

    init: Callable[[Any], Any]
    update_main: Callable[[Any, Any, Any], Tuple[Any, Any]]  # (grads, opt, params)
    update_aux: Callable[[Any, Any, Any], Tuple[Any, Any]]


def shared_adam_init(params) -> AdamSlots:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamSlots(
        mu=zeros,
        nu=jax.tree.map(jnp.zeros_like, params),
        count=jax.tree.map(lambda _: jnp.zeros((), jnp.int32), params),
    )


def shared_adam_update(
    grads,
    slots: AdamSlots,
    params,
    mask,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    lr_scales=None,
):
    """One torch.optim.Adam step on the parameters whose ``mask`` leaf is True.

    Masked-out leaves are untouched — params, moments, AND step count — which
    is exactly torch's behavior for params with ``grad is None`` (not in this
    loss's graph). Masks are static Python bools, so the skipped leaves cost
    nothing inside jit. ``lr_scales`` is an optional congruent pytree of
    static per-leaf learning-rate multipliers (the prior-lr knob).
    """
    p_leaves, treedef = jax.tree_util.tree_flatten(params)
    g_leaves = treedef.flatten_up_to(grads)
    m_leaves = treedef.flatten_up_to(slots.mu)
    n_leaves = treedef.flatten_up_to(slots.nu)
    c_leaves = treedef.flatten_up_to(slots.count)
    mask_leaves = treedef.flatten_up_to(mask)
    scale_leaves = (
        treedef.flatten_up_to(lr_scales)
        if lr_scales is not None
        else [1.0] * len(p_leaves)
    )

    new_p, new_m, new_n, new_c = [], [], [], []
    for p, g, m, n, c, mk, sc in zip(
        p_leaves, g_leaves, m_leaves, n_leaves, c_leaves, mask_leaves, scale_leaves
    ):
        if not mk:
            new_p.append(p), new_m.append(m), new_n.append(n), new_c.append(c)
            continue
        c2 = c + 1
        m2 = b1 * m + (1.0 - b1) * g
        n2 = b2 * n + (1.0 - b2) * g * g
        t = c2.astype(jnp.float32)
        m_hat = m2 / (1.0 - jnp.power(b1, t))
        n_hat = n2 / (1.0 - jnp.power(b2, t))
        new_p.append(p - (lr * sc) * m_hat / (jnp.sqrt(n_hat) + eps))
        new_m.append(m2), new_n.append(n2), new_c.append(c2)

    unflat = jax.tree_util.tree_unflatten
    return unflat(treedef, new_p), AdamSlots(
        unflat(treedef, new_m), unflat(treedef, new_n), unflat(treedef, new_c)
    )


def make_optimizers(spec: ModelSpec, params, lr: float):
    """Round-1 'split' optimizers: two independent masked optax Adams.

    Kept for controlled shared-vs-split experiments (PARITY.md); the shared
    variant is the Pyro-parity default.
    """
    main_mask, aux_mask = param_masks(spec, params)
    adam = lambda: optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    opt_main = optax.masked(adam(), main_mask)
    opt_aux = optax.masked(adam(), aux_mask)
    return opt_main, opt_aux


def make_dual_optimizer(
    spec: ModelSpec,
    params_example,
    lr: float,
    mode: str = "shared",
    prior_lr_mult: float = 1.0,
) -> DualOptimizer:
    """``prior_lr_mult`` scales the conditional-prior nets' learning rate in
    the MAIN update (the only loss that touches them). Diagnosed round-2
    failure mode: the aux-pressured posterior z_u constellation drifts faster
    than p(z_u|u) can track, collapsing PRIOR-mode reconstruction at unlucky
    seeds (RESULTS.md round-2 CVS/challenge seed tables); a >1 multiplier
    lets the prior nets keep pace. Default 1.0 = exact Pyro/torch parity."""
    if mode == "shared":
        main_mask, aux_mask = param_masks(spec, params_example)
        lr_scales = None
        if prior_lr_mult != 1.0:
            lr_scales = {
                group: jax.tree.map(
                    lambda _: prior_lr_mult if group == "priors" else 1.0,
                    params_example[group],
                )
                for group in params_example
            }

        def update(grads, slots, params, mask, lr_scale):
            return shared_adam_update(
                grads, slots, params, mask, lr * lr_scale, lr_scales=lr_scales
            )

        return DualOptimizer(
            init=shared_adam_init,
            update_main=lambda g, s, p, sc=1.0: update(g, s, p, main_mask, sc),
            update_aux=lambda g, s, p, sc=1.0: update(g, s, p, aux_mask, sc),
        )
    if mode == "split":
        if prior_lr_mult != 1.0:
            raise ValueError("prior_lr_mult requires optimizer='shared'")
        opt_main, opt_aux = make_optimizers(spec, params_example, lr)

        def upd_main(grads, opt, params, sc=None):
            if sc is not None and not isinstance(sc, float):
                raise ValueError("lr schedules require optimizer='shared'")
            updates, main_state = opt_main.update(grads, opt[0], params)
            return optax.apply_updates(params, updates), (main_state, opt[1])

        def upd_aux(grads, opt, params, sc=None):
            if sc is not None and not isinstance(sc, float):
                raise ValueError("lr schedules require optimizer='shared'")
            updates, aux_state = opt_aux.update(grads, opt[1], params)
            return optax.apply_updates(params, updates), (opt[0], aux_state)

        return DualOptimizer(
            init=lambda p: (opt_main.init(p), opt_aux.init(p)),
            update_main=upd_main,
            update_aux=upd_aux,
        )
    raise ValueError(f"unknown optimizer mode: {mode!r}")


def make_dual_step(spec: ModelSpec, ts, optim: DualOptimizer, num_particles: int = 1):
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
        sc = batch.get("lr_scale", 1.0)  # per-epoch lr schedule (ours)
        (loss_m, mets), grads = jax.value_and_grad(main_loss, has_aux=True)(
            state.params, k1, batch
        )
        params, opt = optim.update_main(grads, state.opt, state.params, sc)

        loss_a, grads_a = jax.value_and_grad(aux_loss)(params, k2, batch)
        params, opt = optim.update_aux(grads_a, opt, params, sc)

        n = jnp.maximum(jnp.sum(batch["mask"]), 1.0)
        metrics = {"loss_main": loss_m / n, "loss_aux": loss_a / n, "l1": mets["l1"]}
        return SVIState(params, opt, key), metrics

    return _step


# Structural memo for make_train_step: repeated in-process builds with the
# same (spec, ts, lr, ...) — resume flows, multi-run tests, notebooks — would
# otherwise re-trace and re-compile identical programs (the dominant cost on
# CPU hosts and over the axon tunnel). The returned closures are pure; the
# only per-call input NOT in the key is params_example, which contributes
# structure alone and is determined by spec.
_TRAIN_STEP_MEMO = BoundedMemo()


def _ts_key(ts):
    a = np.asarray(ts)
    return (a.shape, str(a.dtype), a.tobytes())


def make_train_step(
    spec: ModelSpec,
    ts,
    lr: float,
    params_example,
    num_particles: int = 1,
    optimizer: str = "shared",
    prior_lr_mult: float = 1.0,
):
    """Returns (init_state_fn, jitted train_step, jitted train_epoch).

    train_step(state, batch) -> (state, metrics) where metrics carries both
    per-loss totals (the reference logs loss/batch_size per loss,
    training_cvs.py:147-157) and the in-model L1. ``num_particles`` averages
    that many reparameterized ELBO particles (Trace_ELBO(num_particles)
    semantics; the reference runs 1, config_cvs.py:47). ``optimizer``:
    'shared' (Pyro-parity single per-param Adam) | 'split' (round-1 behavior).

    Memoized on the structural key — a second call with equal arguments
    returns the SAME jitted closures (no re-trace/re-compile).
    """
    memo_key = (
        spec, _ts_key(ts), float(lr), int(num_particles), optimizer,
        float(prior_lr_mult),
    )
    hit = _TRAIN_STEP_MEMO.get(memo_key)
    if hit is not None:
        return hit
    optim = make_dual_optimizer(
        spec, params_example, lr, optimizer, prior_lr_mult=prior_lr_mult
    )

    def init_state(params, key) -> SVIState:
        # Copy params: train_step/train_epoch DONATE the state, so without a
        # copy the first donated dispatch frees the caller's param buffers —
        # a later init_state from the same params would then feed deleted
        # buffers to the device (surfaces as an opaque INVALID_ARGUMENT on
        # the axon TPU backend, which doesn't track client-side deletion).
        params = jax.tree_util.tree_map(jnp.array, params)
        return SVIState(params, optim.init(params), key)

    _step = make_dual_step(spec, ts, optim, num_particles)

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

    out = (init_state, train_step, train_epoch)
    _TRAIN_STEP_MEMO[memo_key] = out
    return out


_EVAL_EPOCH_MEMO = BoundedMemo()


def make_eval_epoch(spec: ModelSpec, ts):
    """Fused whole-split evaluation: ONE dispatch per (split, mode).

    Computes exactly what the ``eval_split`` host loop computes per minibatch
    — per-loss ELBO (sum over batches of loss/n), recon L1 (sum of per-batch
    masked means / total count), and each label metric over the full split —
    but as a single jitted ``lax.scan`` over the stacked minibatches, so an
    eval epoch costs one host dispatch instead of 3×n_batches jitted calls
    with a float() sync each (round-2 weak #4; the reference's
    ``input_pred_stats`` is a per-batch host loop, /root/reference/
    training_cvs.py:43-144). RNG keying matches ``make_eval_fns`` exactly:
    k1 (split into main/aux) for losses, k2 for recon, k3 for the classifier,
    identical for every batch — with per-sample draw keying this reproduces
    the host loop's numbers to f32 precision (tested).

    Returns ``eval_epoch(params, key, batches, is_post) -> stats`` where
    ``batches`` is a ``stacked_minibatches(split, bs, shuffle=False)`` dict
    (device-resident; the driver caches it once per split) and ``stats`` is a
    small dict of scalars: elbo_main, elbo_aux, l1_sum, n, and one summed
    statistic per label.

    Memoized on (spec, ts) like :func:`make_train_step`.
    """
    memo_key = (spec, _ts_key(ts))
    hit = _EVAL_EPOCH_MEMO.get(memo_key)
    if hit is not None:
        return hit
    ts = jnp.asarray(ts)

    @functools.partial(jax.jit, static_argnames=("is_post",))
    def eval_epoch(params, key, batches, is_post: bool):
        k1, k2, k3 = jax.random.split(key, 3)
        ka, kb = jax.random.split(k1)

        def one(carry, batch):
            n = jnp.sum(batch["mask"])
            nn = jnp.maximum(n, 1.0)
            lm, _ = elbo_main(spec, params, ka, batch, ts)
            la = elbo_aux(spec, params, kb, batch)
            r = recon(spec, params, k2, batch, ts, is_post)
            p = classifier(
                spec, params, k3, batch["observations"], batch.get("sample_id")
            )
            m = batch["mask"]
            label_sums = {}
            for label in spec.labels:
                pred, target = p[label.name], batch[label.name]
                if label.kind == "bernoulli":
                    s = jnp.sum(jnp.all(pred == target, axis=-1) * m)
                elif label.kind == "onehot":
                    s = jnp.sum(
                        (jnp.argmax(pred, -1) == jnp.argmax(target, -1)) * m
                    )
                else:  # continuous: summed per-sample mean squared error
                    s = jnp.sum(jnp.mean((pred - target) ** 2, axis=-1) * m)
                label_sums[label.name] = s
            return carry, {
                "elbo_main": lm / nn,
                "elbo_aux": la / nn,
                "l1": r["l1"],
                "n": n,
                "labels": label_sums,
            }

        _, ys = jax.lax.scan(one, None, batches)
        return jax.tree.map(jnp.sum, ys)

    _EVAL_EPOCH_MEMO[memo_key] = eval_epoch
    return eval_epoch


_EVAL_FNS_MEMO = BoundedMemo()


def make_eval_fns(spec: ModelSpec, ts):
    """Jitted eval-only functions: per-loss ELBO evaluation (SVI.evaluate_loss),
    classifier predictions, posterior/prior reconstruction. Memoized on
    (spec, ts) like :func:`make_train_step`."""
    memo_key = (spec, _ts_key(ts))
    hit = _EVAL_FNS_MEMO.get(memo_key)
    if hit is not None:
        return hit
    ts = jnp.asarray(ts)

    @jax.jit
    def evaluate_losses(params, key, batch):
        k1, k2 = jax.random.split(key)
        loss_m, _ = elbo_main(spec, params, k1, batch, ts)
        loss_a = elbo_aux(spec, params, k2, batch)
        return loss_m, loss_a

    @jax.jit
    def classify(params, key, batch):
        return classifier(
            spec, params, key, batch["observations"], batch.get("sample_id")
        )

    @functools.partial(jax.jit, static_argnames=("is_post",))
    def reconstruct(params, key, batch, is_post: bool):
        return recon(spec, params, key, batch, ts, is_post)

    out = (evaluate_losses, classify, reconstruct)
    _EVAL_FNS_MEMO[memo_key] = out
    return out
