from structured_latent_odes_tpu.parallel.mesh import (  # noqa: F401
    batch_sharded,
    make_mesh,
    pad_batch_to_multiple,
    replicated,
    shard_batch,
    shard_stacked,
)
from structured_latent_odes_tpu.parallel.timepar import (  # noqa: F401
    solve_affine_recurrence_timepar,
    solve_semilinear_timepar,
    time_sharding,
)
from structured_latent_odes_tpu.parallel.train import (  # noqa: F401
    make_dp_eval_step,
    make_dp_train_step,
)
