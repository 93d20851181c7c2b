from structured_latent_odes_tpu.utils.config import Config  # noqa: F401
from structured_latent_odes_tpu.utils.rng import set_seed, KeyChain  # noqa: F401
