from structured_latent_odes_tpu.ops.recurrence import (  # noqa: F401
    affine_scan_pallas,
    affine_scan_pallas_tm,
)
