from structured_latent_odes_tpu.prob.distributions import (  # noqa: F401
    sample_bernoulli,
    sample_onehot_categorical,
    bernoulli_logpmf,
    kl_normal_normal,
    laplace_logpdf,
    normal_logpdf,
    onehot_categorical_logpmf,
    sample_laplace,
    per_sample_keys,
    sample_normal,
    sample_normal_ps,
    sum_event,
)
from structured_latent_odes_tpu.prob.elbo import (  # noqa: F401
    Trace,
    masked_l1_per_channel,
    quantile_laplace_logprob,
)
