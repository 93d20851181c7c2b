"""Distribution log-probabilities and reparameterized sampling.

Minimal explicit replacements for the Pyro distribution surface the reference
actually uses (Normal/Laplace/Bernoulli/OneHotCategorical with ``.to_event(1)``
— e.g. /root/reference/models/mechanistic_cvs.py:128-139,199-209,267-270).
All functions are pure, broadcast like jnp, and return *elementwise* log-probs;
``sum_event`` applies the ``to_event(1)`` reduction (sum over the trailing
event dim, keeping the batch dim for per-sample masking).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array

_LOG_2PI = math.log(2.0 * math.pi)
_EPS = 1e-7


def normal_logpdf(x: Array, loc: Array, scale: Array) -> Array:
    z = (x - loc) / scale
    return -0.5 * (z * z) - jnp.log(scale) - 0.5 * _LOG_2PI


def laplace_logpdf(x: Array, loc: Array, scale: Array) -> Array:
    return -jnp.abs(x - loc) / scale - jnp.log(2.0 * scale)


def bernoulli_logpmf(x: Array, probs: Array) -> Array:
    p = jnp.clip(probs, _EPS, 1.0 - _EPS)
    return x * jnp.log(p) + (1.0 - x) * jnp.log1p(-p)


def onehot_categorical_logpmf(x: Array, probs: Array) -> Array:
    """log p of a one-hot ``x`` under (already normalized) class ``probs``.

    Returns elementwise ``x * log p`` — summing the trailing dim yields the
    categorical log-pmf, matching ``OneHotCategorical(probs).to_event(1)``.
    """
    p = jnp.clip(probs, _EPS, 1.0)
    return x * jnp.log(p)


def sample_normal(key: Array, loc: Array, scale: Array) -> Array:
    """Reparameterized normal draw: ``loc + scale * eps``."""
    eps = jax.random.normal(key, jnp.shape(loc), dtype=jnp.result_type(loc))
    return loc + scale * eps


def per_sample_keys(key: Array, sample_ids: Array) -> Array:
    """One independent PRNG key per sample: folds each sample's identity into
    the site key, so a sample's draw depends only on (site key, sample_id) —
    never on batch size, padding, or the other samples in the batch. This
    makes padded-vs-unpadded batches bit-identical and checkpoint resume
    batch-exact; combined with per-split (not per-batch) eval keys
    (train/driver.py eval_split), recon outputs and label metrics are also
    independent of the eval batch size."""
    return jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, sample_ids)


def sample_normal_ps(key: Array, sample_ids: Array, loc: Array, scale: Array) -> Array:
    """Per-sample-keyed reparameterized normal draw; ``loc``/``scale`` are
    (B, ...) with ``sample_ids`` (B,) integer identities."""
    keys = per_sample_keys(key, sample_ids)
    dtype = jnp.result_type(loc)
    eps = jax.vmap(lambda k, l: jax.random.normal(k, l.shape, dtype))(keys, loc)
    return loc + scale * eps


def sample_laplace(key: Array, loc: Array, scale: Array) -> Array:
    u = jax.random.uniform(
        key, jnp.shape(loc), dtype=jnp.result_type(loc), minval=-0.5 + 1e-7, maxval=0.5
    )
    return loc - scale * jnp.sign(u) * jnp.log1p(-2.0 * jnp.abs(u))


def sample_bernoulli(key: Array, probs: Array) -> Array:
    return (jax.random.uniform(key, jnp.shape(probs)) < probs).astype(jnp.result_type(probs))


def sample_onehot_categorical(key: Array, probs: Array) -> Array:
    idx = jax.random.categorical(key, jnp.log(jnp.clip(probs, _EPS, 1.0)), axis=-1)
    return jax.nn.one_hot(idx, jnp.shape(probs)[-1], dtype=jnp.result_type(probs))


def kl_normal_normal(loc_q: Array, scale_q: Array, loc_p: Array, scale_p: Array) -> Array:
    """Analytic KL(q || p) between diagonal normals (elementwise)."""
    var_ratio = (scale_q / scale_p) ** 2
    t1 = ((loc_q - loc_p) / scale_p) ** 2
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


def sum_event(logp: Array, event_dims: int = 1) -> Array:
    """Sum the trailing ``event_dims`` axes (Pyro's ``.to_event``)."""
    if event_dims == 0:
        return logp
    return jnp.sum(logp, axis=tuple(range(-event_dims, 0)))
