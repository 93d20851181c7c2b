from structured_latent_odes_tpu.train.svi import (  # noqa: F401
    SVIState,
    make_dual_step,
    make_eval_fns,
    make_optimizers,
    make_train_step,
)
from structured_latent_odes_tpu.train.driver import (  # noqa: F401
    EvalStats,
    eval_split,
    final_test_eval,
    run_training_epochs,
)
from structured_latent_odes_tpu.train import artifacts, checkpoint, metrics  # noqa: F401
