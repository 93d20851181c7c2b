from structured_latent_odes_tpu.nn.layers import (  # noqa: F401
    ConvEncoderSpec,
    MLPSpec,
    conv_encoder_apply,
    conv_encoder_init,
    linear_apply,
    linear_init,
    mlp_apply,
    mlp_init,
)
from structured_latent_odes_tpu.nn.ode_model import (  # noqa: F401
    OdeModelSpec,
    dynamics_prod_degr,
    dynamics_rhs,
    initialize_state,
    ode_model_init,
    solve_ode,
)
from structured_latent_odes_tpu.nn.decoders import (  # noqa: F401
    DecoderSpec,
    decoder_apply,
    decoder_init,
)
