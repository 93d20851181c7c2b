from structured_latent_odes_tpu.data import challenge, configs, cvs, loader, proc, transforms  # noqa: F401
