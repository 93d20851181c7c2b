"""Distribution log-prob parity vs scipy.stats / torch.distributions."""

import jax.numpy as jnp
import numpy as np
import torch
from scipy import stats

from structured_latent_odes_tpu.prob import (
    Trace,
    bernoulli_logpmf,
    kl_normal_normal,
    laplace_logpdf,
    masked_l1_per_channel,
    normal_logpdf,
    onehot_categorical_logpmf,
    quantile_laplace_logprob,
    sample_normal,
    sum_event,
)
import jax


def test_normal_logpdf_vs_scipy():
    x = np.linspace(-3, 3, 11)
    lp = normal_logpdf(jnp.asarray(x), 0.3, 1.7)
    ref = stats.norm.logpdf(x, 0.3, 1.7)
    assert np.allclose(lp, ref, atol=1e-4)


def test_laplace_logpdf_vs_scipy():
    x = np.linspace(-3, 3, 11)
    lp = laplace_logpdf(jnp.asarray(x), -0.2, 0.8)
    ref = stats.laplace.logpdf(x, -0.2, 0.8)
    assert np.allclose(lp, ref, atol=1e-4)


def test_bernoulli_vs_torch():
    probs = np.array([0.1, 0.5, 0.93])
    for x in (0.0, 1.0):
        lp = bernoulli_logpmf(x, jnp.asarray(probs))
        ref = torch.distributions.Bernoulli(probs=torch.tensor(probs)).log_prob(torch.tensor(x))
        assert np.allclose(lp, ref.numpy(), atol=1e-4)


def test_onehot_categorical_vs_torch():
    probs = np.array([[0.2, 0.3, 0.5], [0.6, 0.1, 0.3]])
    x = np.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    lp = sum_event(onehot_categorical_logpmf(jnp.asarray(x), jnp.asarray(probs)))
    ref = torch.distributions.OneHotCategorical(probs=torch.tensor(probs)).log_prob(
        torch.tensor(x)
    )
    assert np.allclose(lp, ref.numpy(), atol=1e-4)


def test_kl_normal_matches_torch():
    q = torch.distributions.Normal(torch.tensor([0.5]), torch.tensor([1.2]))
    p = torch.distributions.Normal(torch.tensor([-0.3]), torch.tensor([0.7]))
    ref = torch.distributions.kl_divergence(q, p)
    kl = kl_normal_normal(0.5, 1.2, -0.3, 0.7)
    assert np.allclose(kl, ref.numpy(), atol=1e-4)


def test_sample_normal_moments():
    key = jax.random.key(0)
    z = sample_normal(key, jnp.full((20000,), 2.0), jnp.full((20000,), 0.5))
    assert abs(float(jnp.mean(z)) - 2.0) < 0.02
    assert abs(float(jnp.std(z)) - 0.5) < 0.02


def test_trace_elbo_analytic_gaussian():
    """ELBO for q=N(m,s), p=N(0,1), obs x ~ N(z, 1): check against the direct
    formula at the same sample."""
    key = jax.random.key(1)
    m, s = jnp.asarray([[0.4, -0.2]]), jnp.asarray([[0.9, 1.1]])
    z = sample_normal(key, m, s)
    x = jnp.asarray([[1.0, 0.5]])

    tr = Trace()
    tr.latent_normal(z, m, s, jnp.zeros_like(m), jnp.ones_like(s))
    tr.obs(normal_logpdf(x, z, 1.0))
    elbo = tr.elbo()

    direct = (
        np.sum(stats.norm.logpdf(np.asarray(z), 0, 1))
        - np.sum(stats.norm.logpdf(np.asarray(z), np.asarray(m), np.asarray(s)))
        + np.sum(stats.norm.logpdf(np.asarray(x), np.asarray(z), 1.0))
    )
    assert np.allclose(elbo, direct, atol=1e-3)


def test_trace_mask_zeroes_padded_samples():
    tr = Trace()
    tr.obs(jnp.ones((4, 3)))
    assert float(tr.elbo(jnp.asarray([1.0, 1.0, 0.0, 0.0]))) == 6.0


def test_quantile_weighting_matches_masked_split():
    """where-weighting == Pyro's two masked_select passes summed."""
    rng = np.random.RandomState(0)
    target = rng.randn(5, 3, 7).astype(np.float32)
    mu = rng.randn(5, 3, 7).astype(np.float32)
    std = np.abs(rng.randn(5, 3, 7)).astype(np.float32) + 0.5
    tau = 0.975
    ours = float(jnp.sum(quantile_laplace_logprob(target, mu, std, tau)))
    ge = target >= mu
    ref = tau * stats.laplace.logpdf(target[ge], mu[ge], std[ge]).sum() + (
        1 - tau
    ) * stats.laplace.logpdf(target[~ge], mu[~ge], std[~ge]).sum()
    assert np.allclose(ours, ref, rtol=1e-5)


def test_masked_l1_matches_reference_bookkeeping():
    rng = np.random.RandomState(1)
    target = rng.randn(4, 3, 6).astype(np.float32)
    mu = rng.randn(4, 3, 6).astype(np.float32)
    ours = float(masked_l1_per_channel(jnp.asarray(target), jnp.asarray(mu)))
    ref = 0.0
    for c in range(3):
        m = target[:, c, :] >= mu[:, c, :]
        ref += np.abs(target[:, c, :][m] - mu[:, c, :][m]).mean()
    assert np.allclose(ours, ref, rtol=1e-5)
