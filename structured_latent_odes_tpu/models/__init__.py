from structured_latent_odes_tpu.models.spec import (  # noqa: F401
    LabelSpec,
    LatentBlock,
    ModelSpec,
)
from structured_latent_odes_tpu.models.slode import (  # noqa: F401
    classifier,
    elbo_aux,
    elbo_main,
    init_params,
    init_params_fast,
    param_masks,
    recon,
    sample_prior_z,
)
from structured_latent_odes_tpu.models.zoo import (  # noqa: F401
    challenge_spec,
    cvs_spec,
    proc_spec,
)
