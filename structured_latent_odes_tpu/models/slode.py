"""The generic structured latent-ODE VAE (SLODE).

One model implementation instantiates all six reference model classes
(/root/reference/models/mechanistic_{cvs,proc,challenge}[_Gauss].py) from a
declarative :class:`~structured_latent_odes_tpu.models.spec.ModelSpec`:

- ``elbo_main``  — the generative ELBO (reference ``model``/``guide`` pair
  under pyro SVI + Trace_ELBO)
- ``elbo_aux``   — the auxiliary classification ELBO (reference
  ``model_meta``/``guide_meta``)
- ``classifier`` — label predictions from posterior samples (reference
  ``classifier``/``pred_inputs``)
- ``recon``      — posterior/prior reconstruction with quantile bands
  (reference ``recon``)

All functions are pure ``(params, key, batch) -> value`` with explicit RNG
keys and an optional per-sample ``mask`` for static-shape padded batches, so
they jit/pjit/vmap cleanly.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from structured_latent_odes_tpu.models.spec import LabelSpec, ModelSpec
from structured_latent_odes_tpu.nn.decoders import decoder_apply, decoder_init
from structured_latent_odes_tpu.nn.layers import (
    conv_encoder_apply,
    conv_encoder_init,
    mlp_apply,
    mlp_init,
)
from structured_latent_odes_tpu.prob import (
    Trace,
    bernoulli_logpmf,
    laplace_logpdf,
    masked_l1_per_channel,
    normal_logpdf,
    onehot_categorical_logpmf,
    quantile_laplace_logprob,
    sample_normal_ps,
)

Array = jax.Array
Batch = Dict[str, Array]


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------


def init_params(key: Array, spec: ModelSpec):
    keys = iter(jax.random.split(key, 8 + 2 * len(spec.labels)))
    params = {
        "encoder": conv_encoder_init(next(keys), spec.encoder),
        "decoder": decoder_init(next(keys), spec.decoder),
        "priors": {},
        "aux": {},
        "aux_std": {},
    }
    if spec.prior == "separate":
        for block in spec.labeled_blocks:
            params["priors"][block.name] = mlp_init(next(keys), spec.prior_spec(block.name))
    else:
        params["priors"]["z_u"] = mlp_init(next(keys), spec.prior_spec())
    for label in spec.labels:
        params["aux"][label.name] = mlp_init(next(keys), spec.aux_head_spec(label))
        if label.kind == "continuous":
            # learnable scalar std per continuous label (mechanistic_proc.py:119-122)
            params["aux_std"][label.name] = jnp.full((label.dim,), 1e-2)
    return params


@functools.lru_cache(maxsize=16)
def _init_params_jitted(spec: ModelSpec):
    return jax.jit(lambda key: init_params(key, spec))


def init_params_fast(key: Array, spec: ModelSpec):
    """One-compile parameter init. Eager :func:`init_params` dispatches
    hundreds of tiny ops — fine locally, but over a remote-tunnel backend
    each eager op costs ~1s of round-trip compile (measured: 481s for one
    CVS init on the axon tunnel). Jitting the whole init is ONE executable,
    cached per (hashable, frozen) spec — so the S members of a sweep pay one
    compile total."""
    return _init_params_jitted(spec)(key)


def param_masks(spec: ModelSpec, params) -> Tuple[Dict, Dict]:
    """Static bool masks of which top-level param groups each loss updates.

    Pyro's per-parameter Adam only steps params that received gradients in a
    given ``SVI.step``; the main loss touches encoder/decoder/priors (plus the
    aux heads for proc, whose model scores aux sites too), the aux loss
    touches encoder + aux heads (SURVEY.md §3.2).
    """

    def fill(tree, value):
        return jax.tree.map(lambda _: value, tree)

    main = {
        "encoder": fill(params["encoder"], True),
        "decoder": fill(params["decoder"], True),
        "priors": fill(params["priors"], True),
        "aux": fill(params["aux"], spec.aux_in_model),
        "aux_std": fill(params["aux_std"], spec.aux_in_model),
    }
    aux = {
        "encoder": fill(params["encoder"], True),
        "decoder": fill(params["decoder"], False),
        "priors": fill(params["priors"], False),
        "aux": fill(params["aux"], True),
        "aux_std": fill(params["aux_std"], True),
    }
    return main, aux


# ---------------------------------------------------------------------------
# pieces
# ---------------------------------------------------------------------------


def encode(spec: ModelSpec, params, obs: Array) -> Tuple[Array, Array]:
    return conv_encoder_apply(spec.encoder, params["encoder"], obs)


def _sample_ids(batch: Batch) -> Array:
    """Integer identity per sample for per-sample RNG keying. Loaders attach
    the sample's global index within its split as ``sample_id``; absent that,
    the within-batch position (still padding-stable, since padding appends)."""
    sid = batch.get("sample_id")
    if sid is None:
        return jnp.arange(batch["observations"].shape[0])
    return sid


def _prior_input(spec: ModelSpec, batch: Batch) -> Array:
    return jnp.concatenate([batch[name] for name in spec.prior_input_order], axis=-1)


def prior_params(spec: ModelSpec, params, batch: Batch):
    """Conditional-prior (loc, scale) per labeled block / joint z_u."""
    if spec.prior == "separate":
        out = {}
        for block in spec.labeled_blocks:
            label = next(l for l in spec.labels if l.block == block.name)
            loc, scale = mlp_apply(
                spec.prior_spec(block.name), params["priors"][block.name], batch[label.name]
            )
            out[block.name] = (loc, scale)
        return out
    loc, scale = mlp_apply(spec.prior_spec(), params["priors"]["z_u"], _prior_input(spec, batch))
    return {"z_u": (loc, scale)}


def sample_prior_z(spec: ModelSpec, params, key: Array, batch: Batch) -> Array:
    """z ~ p(z|u): conditional priors for labeled blocks + N(0, I) epsilon
    (reference ``get_prior_z`` / the prior branch of ``recon``)."""
    pp = prior_params(spec, params, batch)
    batch_size = batch["observations"].shape[0]
    sids = _sample_ids(batch)
    parts = []
    if spec.prior == "separate":
        for block in spec.labeled_blocks:
            key, sub = jax.random.split(key)
            loc, scale = pp[block.name]
            parts.append(sample_normal_ps(sub, sids, loc, scale))
    else:
        key, sub = jax.random.split(key)
        loc, scale = pp["z_u"]
        parts.append(sample_normal_ps(sub, sids, loc, scale))
    key, sub = jax.random.split(key)
    eps_dim = spec.epsilon_block.dim
    zeros = jnp.zeros((batch_size, eps_dim))
    parts.append(sample_normal_ps(sub, sids, zeros, jnp.ones_like(zeros)))
    return jnp.concatenate(parts, axis=-1)


def _aux_head(spec: ModelSpec, params, label: LabelSpec, z_block: Array):
    return mlp_apply(spec.aux_head_spec(label), params["aux"][label.name], z_block)


def _aux_mult(spec: ModelSpec, batch: Batch):
    """Aux site scale: the spec constant, overridable per batch with an
    ``aux_mult`` scalar (enables annealing schedules under jit/scan)."""
    return batch.get("aux_mult", spec.aux_loss_multiplier)


def _aux_obs_terms(spec: ModelSpec, params, tr: Trace, z: Array, batch: Batch) -> None:
    """Score q(u|z_u) heads as scaled observed sites (reference ``q_label`` /
    ``q_continous``); z is the full latent, split per block."""
    mult = _aux_mult(spec, batch)
    for label in spec.labels:
        z_block = z[:, spec.block_slice(label.block)]
        target = batch[label.name]
        if label.kind == "bernoulli":
            alpha = _aux_head(spec, params, label, z_block)
            tr.obs(bernoulli_logpmf(target, alpha), scale=mult)
        elif label.kind == "onehot":
            alpha = _aux_head(spec, params, label, z_block)
            tr.obs(onehot_categorical_logpmf(target, alpha), scale=mult)
        else:  # continuous
            loc, _ = _aux_head(spec, params, label, z_block)
            std = jax.nn.softplus(params["aux_std"][label.name]) + 1e-6
            tr.obs(laplace_logpdf(target, loc, std), scale=mult)


def _observation_terms(
    spec: ModelSpec, tr: Trace, obs: Array, decoded, sample_mask: Optional[Array]
):
    """Likelihood sites + the reference's side-channel L1 metric."""
    if spec.likelihood == "quantile":
        _, mu_75, mu_50, mu_25, std = decoded
        taus = (0.5, 0.5 + spec.quantile_diff, 0.5 - spec.quantile_diff)
        for mu, tau in ((mu_50, taus[0]), (mu_75, taus[1]), (mu_25, taus[2])):
            tr.obs(quantile_laplace_logprob(obs, mu, std, tau), event_dims=2)
        l1 = masked_l1_per_channel(obs, mu_50, sample_mask)
    else:
        _, mean, std = decoded
        tr.obs(normal_logpdf(obs, mean, std), event_dims=2)
        l1 = _masked_mean_abs(obs - mean, sample_mask)
    return l1


def _masked_mean_abs(err: Array, sample_mask: Optional[Array]) -> Array:
    if sample_mask is None:
        return jnp.mean(jnp.abs(err))
    w = sample_mask[:, None, None]
    return jnp.sum(jnp.abs(err) * w) / jnp.maximum(jnp.sum(w) * err.shape[1] * err.shape[2], 1.0)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def elbo_main(
    spec: ModelSpec, params, key: Array, batch: Batch, ts: Array
) -> Tuple[Array, Dict[str, Array]]:
    """-ELBO of the generative model/guide pair (one Trace_ELBO particle).

    Guide: q(z|x) from the conv encoder, sampled per labeled-block group;
    Model: conditional priors p(z_u|u), N(0,I) epsilon, ODE-decode likelihood
    (+ the aux sites when ``spec.aux_in_model``, mechanistic_proc.py:145-146).
    Returns (loss, metrics) where metrics carries the reference's in-model L1.
    """
    obs = batch["observations"]
    mask = batch.get("mask")
    sids = _sample_ids(batch)
    loc, scale = encode(spec, params, obs)
    tr = Trace()

    pp = prior_params(spec, params, batch)
    z_u_dim, eps_dim = spec.z_u_dim, spec.epsilon_block.dim

    if spec.prior == "separate":
        parts = []
        for block in spec.labeled_blocks:
            key, sub = jax.random.split(key)
            s = spec.block_slice(block.name)
            z_b = sample_normal_ps(sub, sids, loc[:, s], scale[:, s])
            p_loc, p_scale = pp[block.name]
            tr.latent_normal(z_b, loc[:, s], scale[:, s], p_loc, p_scale)
            parts.append(z_b)
        z_u = jnp.concatenate(parts, axis=-1) if parts else jnp.zeros((obs.shape[0], 0))
    else:
        key, sub = jax.random.split(key)
        q_loc, q_scale = loc[:, :z_u_dim], scale[:, :z_u_dim]
        z_u = sample_normal_ps(sub, sids, q_loc, q_scale)
        p_loc, p_scale = pp["z_u"]
        tr.latent_normal(z_u, q_loc, q_scale, p_loc, p_scale)

    key, sub = jax.random.split(key)
    q_loc_e, q_scale_e = loc[:, -eps_dim:], scale[:, -eps_dim:]
    z_eps = sample_normal_ps(sub, sids, q_loc_e, q_scale_e)
    tr.latent_normal(z_eps, q_loc_e, q_scale_e, jnp.zeros_like(q_loc_e), jnp.ones_like(q_scale_e))

    z = jnp.concatenate([z_u, z_eps], axis=-1)

    if spec.aux_in_model:
        _aux_obs_terms(spec, params, tr, z, batch)

    decoded = decoder_apply(spec.decoder, params["decoder"], z, ts)
    l1 = _observation_terms(spec, tr, obs, decoded, mask)
    return tr.loss(mask), {"l1": l1}


def elbo_aux(spec: ModelSpec, params, key: Array, batch: Batch) -> Array:
    """-ELBO of the auxiliary loss (reference ``model_meta`` with the no-op
    ``guide_meta``): per labeled block, sample z_b from the encoder posterior
    *in the model trace* (so its log-prob contributes) and score the scaled
    classifier/regressor sites (mechanistic_cvs.py:240-276)."""
    obs = batch["observations"]
    mask = batch.get("mask")
    sids = _sample_ids(batch)
    loc, scale = encode(spec, params, obs)
    tr = Trace()
    z_parts = {}
    for block in spec.labeled_blocks:
        key, sub = jax.random.split(key)
        s = spec.block_slice(block.name)
        z_b = sample_normal_ps(sub, sids, loc[:, s], scale[:, s])
        tr.model_sampled_normal(z_b, loc[:, s], scale[:, s])
        z_parts[block.name] = z_b

    mult = _aux_mult(spec, batch)
    for label in spec.labels:
        z_block = z_parts[label.block]
        target = batch[label.name]
        if label.kind == "bernoulli":
            tr.obs(bernoulli_logpmf(target, _aux_head(spec, params, label, z_block)), scale=mult)
        elif label.kind == "onehot":
            tr.obs(
                onehot_categorical_logpmf(target, _aux_head(spec, params, label, z_block)),
                scale=mult,
            )
        else:
            loc_u, _ = _aux_head(spec, params, label, z_block)
            std = jax.nn.softplus(params["aux_std"][label.name]) + 1e-6
            tr.obs(laplace_logpdf(target, loc_u, std), scale=mult)
    return tr.loss(mask)


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------


def classifier(
    spec: ModelSpec, params, key: Array, obs: Array, sample_ids: Optional[Array] = None
) -> Dict[str, Array]:
    """Predict system inputs from posterior samples (reference ``classifier``/
    ``pred_inputs``): bernoulli -> thresholded at 0.5, onehot -> argmax
    one-hot, continuous -> regressed loc."""
    loc, scale = encode(spec, params, obs)
    sids = jnp.arange(obs.shape[0]) if sample_ids is None else sample_ids
    out = {}
    for label in spec.labels:
        key, sub = jax.random.split(key)
        s = spec.block_slice(label.block)
        z_b = sample_normal_ps(sub, sids, loc[:, s], scale[:, s])
        if label.kind == "bernoulli":
            alpha = _aux_head(spec, params, label, z_b)
            out[label.name] = (alpha > 0.5).astype(obs.dtype)
        elif label.kind == "onehot":
            alpha = _aux_head(spec, params, label, z_b)
            out[label.name] = jax.nn.one_hot(
                jnp.argmax(alpha, axis=-1), label.dim, dtype=obs.dtype
            )
        else:
            loc_u, _ = _aux_head(spec, params, label, z_b)
            out[label.name] = loc_u
    return out


def recon(
    spec: ModelSpec,
    params,
    key: Array,
    batch: Batch,
    ts: Array,
    is_post: bool,
) -> Dict[str, Array]:
    """Reconstruction from posterior or conditional-prior latents.

    Returns the reference ``recon`` dict: l1, solution_xt, mu_75/50/25, std, z
    (mechanistic_cvs.py:298-323; Gauss bands = mean +/- 2 std,
    mechanistic_cvs_Gauss.py:300-302).
    """
    obs = batch["observations"]
    mask = batch.get("mask")
    if is_post:
        loc, scale = encode(spec, params, obs)
        key, sub = jax.random.split(key)
        z = sample_normal_ps(sub, _sample_ids(batch), loc, scale)
    else:
        key, sub = jax.random.split(key)
        z = sample_prior_z(spec, params, sub, batch)

    decoded = decoder_apply(spec.decoder, params["decoder"], z, ts)
    if spec.likelihood == "quantile":
        sol, mu_75, mu_50, mu_25, std = decoded
    else:
        sol, mean, std = decoded
        mu_50, mu_75, mu_25 = mean, mean + 2.0 * std, mean - 2.0 * std
    l1 = _masked_mean_abs(mu_50 - obs, mask)
    return {
        "l1": l1,
        "solution_xt": sol,
        "mu_75": mu_75,
        "mu_50": mu_50,
        "mu_25": mu_25,
        "std": std,
        "z": z,
    }
