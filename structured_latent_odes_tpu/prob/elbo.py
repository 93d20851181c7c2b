"""Explicit Trace-ELBO engine (replaces pyro.infer.SVI/Trace_ELBO).

Pyro's ``Trace_ELBO`` with fully reparameterized sites computes::

    elbo = sum_obs scale_site * log p(obs | ...)
         + sum_latent scale_site * (log p(z) - log q(z))     [at the sample]

(the "MC KL" form — evaluated at the reparameterized sample, not analytic;
this matters for gradient parity). Since every model in this framework is a
fixed DAG of named sites, we accumulate terms explicitly via :class:`Trace`
instead of effect handlers. ``poutine.scale`` becomes the ``scale=`` argument;
``to_event(1)`` is the default trailing-dim sum; per-sample accumulation keeps
a batch axis so padded samples can be masked out (static shapes under jit).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from structured_latent_odes_tpu.prob.distributions import (
    laplace_logpdf,
    normal_logpdf,
    sum_event,
)

Array = jax.Array


class Trace:
    """Accumulates per-sample log-prob terms of a model/guide pair.

    All ``add_*`` methods expect arrays whose leading axis is the batch; the
    event (trailing) dims are summed. ``elbo(mask)`` returns the summed ELBO
    over unmasked samples (a scalar). The corresponding loss is ``-elbo``.
    """

    def __init__(self) -> None:
        self._terms = []  # list of (B,) arrays

    def add(self, logp: Array, scale: float | Array = 1.0, event_dims: int = 1) -> None:
        term = sum_event(logp, event_dims)
        self._terms.append(scale * term)

    def latent_normal(
        self,
        z: Array,
        q_loc: Array,
        q_scale: Array,
        p_loc: Array,
        p_scale: Array,
        scale: float | Array = 1.0,
    ) -> None:
        """Reparameterized latent site: contributes log p(z) - log q(z)."""
        logp = normal_logpdf(z, p_loc, p_scale)
        logq = normal_logpdf(z, q_loc, q_scale)
        self.add(logp - logq, scale=scale)

    def model_sampled_normal(self, z: Array, loc: Array, scale_: Array, scale: float | Array = 1.0) -> None:
        """Site sampled *in the model* with no guide counterpart (the
        reference's ``model_meta`` pattern, e.g.
        /root/reference/models/mechanistic_cvs.py:248-256): contributes
        ``+log p(z)`` evaluated at the reparameterized sample."""
        self.add(normal_logpdf(z, loc, scale_), scale=scale)

    def obs(self, logp: Array, scale: float | Array = 1.0, event_dims: int = 1) -> None:
        self.add(logp, scale=scale, event_dims=event_dims)

    def per_sample(self) -> Array:
        return sum(self._terms)

    def elbo(self, mask: Optional[Array] = None) -> Array:
        ps = self.per_sample()
        if mask is not None:
            ps = ps * mask
        return jnp.sum(ps)

    def loss(self, mask: Optional[Array] = None) -> Array:
        return -self.elbo(mask)


def quantile_laplace_logprob(target: Array, mu: Array, std: Array, tau: float | Array) -> Array:
    """Elementwise asymmetric-Laplace quantile log-likelihood.

    Recasts the reference's dynamic ``masked_select`` + ``poutine.scale`` split
    (/root/reference/models/mechanistic_cvs.py:142-211) as a static
    ``where``-weighting — jit/TPU friendly and numerically identical in sum:
    elements with ``target >= mu`` weigh ``tau``, others ``1 - tau``.
    """
    w = jnp.where(target >= mu, tau, 1.0 - tau)
    return w * laplace_logpdf(target, mu, std)


def masked_l1_per_channel(target: Array, mu: Array, sample_mask: Optional[Array] = None) -> Array:
    """The reference's side-channel L1 bookkeeping: for each channel, the mean
    absolute error over elements where ``target >= mu``, summed over channels
    (``l1_loss = x0[3] + x1[3] + x2[3]``,
    /root/reference/models/mechanistic_cvs.py:177-178 with the tau=0.5,
    ``x_greater_mu=1`` masks). Shapes: ``(B, K, T)``.
    """
    mask = (target >= mu).astype(target.dtype)
    if sample_mask is not None:
        mask = mask * sample_mask[:, None, None]
    abs_err = jnp.abs(target - mu) * mask
    per_channel = jnp.sum(abs_err, axis=(0, 2)) / jnp.maximum(jnp.sum(mask, axis=(0, 2)), 1.0)
    return jnp.sum(per_channel)
