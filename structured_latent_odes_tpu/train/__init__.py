from structured_latent_odes_tpu.train.svi import (  # noqa: F401
    AdamSlots,
    DualOptimizer,
    SVIState,
    make_dual_optimizer,
    make_dual_step,
    make_eval_fns,
    make_optimizers,
    make_train_step,
    shared_adam_init,
    shared_adam_update,
)
from structured_latent_odes_tpu.train.driver import (  # noqa: F401
    EvalStats,
    eval_split,
    final_test_eval,
    run_training_epochs,
)
from structured_latent_odes_tpu.train import artifacts, checkpoint, metrics  # noqa: F401
