from structured_latent_odes_tpu.ode.solvers import (  # noqa: F401
    odeint,
    odeint_adaptive,
    rk_step,
    solve,
)
from structured_latent_odes_tpu.ode.semilinear import (  # noqa: F401
    rk_affine_coeffs,
    solve_affine_recurrence,
    solve_affine_sequential,
    solve_semilinear,
    stage_time_grid,
)
from structured_latent_odes_tpu.ode.adjoint import (  # noqa: F401
    odeint_adaptive_adjoint,
    odeint_adjoint,
)
from structured_latent_odes_tpu.ode.tableaus import TABLEAUS, get_tableau  # noqa: F401
