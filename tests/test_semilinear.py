"""Semilinear fast-path tests: the parallel affine scan must reproduce the
generic sequential RK discretization to roundoff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structured_latent_odes_tpu.ode import (
    odeint,
    rk_affine_coeffs,
    solve_affine_recurrence,
    solve_affine_sequential,
    solve_semilinear,
    stage_time_grid,
)
from structured_latent_odes_tpu.ode.tableaus import get_tableau


def _a_fn(t):
    return jnp.sin(t) * 0.5 + 1.0


def _d_fn(t):
    return jnp.cos(0.7 * t) * 0.3 + 0.6


def test_affine_recurrence_assoc_vs_sequential():
    key = jax.random.key(0)
    A = jax.random.uniform(jax.random.key(1), (50, 8, 4), minval=0.8, maxval=1.1)
    B = jax.random.normal(jax.random.key(2), (50, 8, 4)) * 0.1
    x0 = jax.random.normal(key, (8, 4))
    seq = solve_affine_sequential(A, B, x0)
    par = solve_affine_recurrence(A, B, x0, time_axis=0)
    assert np.allclose(seq, par, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("method", ["euler", "midpoint", "rk4", "dopri5"])
def test_semilinear_matches_generic_odeint(method):
    """dx/dt = a(t) - d(t) x: affine-coeff scan == generic RK scan."""
    ts = jnp.linspace(0.0, 8.0, 87)  # CVS-like horizon
    B, D = 6, 5
    x0 = jax.random.uniform(jax.random.key(3), (B, D))

    def prod_degr(stage_ts):  # (T-1, S) -> (B, T-1, S, D)
        a = jnp.broadcast_to(_a_fn(stage_ts)[None, :, :, None], (B,) + stage_ts.shape + (D,))
        d = jnp.broadcast_to(_d_fn(stage_ts)[None, :, :, None], (B,) + stage_ts.shape + (D,))
        return a, d

    sol = solve_semilinear(prod_degr, x0, ts, method=method)  # (B, T, D)

    f = lambda t, y: _a_fn(t) - _d_fn(t) * y
    ref = odeint(f, x0, ts, method=method)  # (T, B, D)
    assert np.allclose(sol, jnp.moveaxis(ref, 0, 1), rtol=1e-5, atol=1e-5)


def test_semilinear_nonuniform_grid():
    """Non-uniform observation times (synbio plate-reader style)."""
    ts = jnp.cumsum(jnp.asarray(np.abs(np.random.RandomState(0).randn(40)) * 0.2 + 0.05))
    x0 = jnp.asarray([[0.3, 0.9]])

    def prod_degr(stage_ts):
        a = jnp.broadcast_to(_a_fn(stage_ts)[None, :, :, None], (1,) + stage_ts.shape + (2,))
        d = jnp.broadcast_to(_d_fn(stage_ts)[None, :, :, None], (1,) + stage_ts.shape + (2,))
        return a, d

    sol = solve_semilinear(prod_degr, x0, ts, method="midpoint")
    f = lambda t, y: _a_fn(t) - _d_fn(t) * y
    ref = odeint(f, x0, ts, method="midpoint")
    assert np.allclose(sol, jnp.moveaxis(ref, 0, 1), rtol=1e-5, atol=1e-5)


def test_affine_coeffs_constant_case():
    """Constant a, d: midpoint affine coeffs have the known closed form."""
    h = jnp.asarray([0.1])
    a = jnp.full((1, 2, 1), 2.0)
    d = jnp.full((1, 2, 1), 0.5)
    A, B = rk_affine_coeffs(a, d, h, get_tableau("midpoint"))
    # x' = x + h*(a - d*(x + h/2*(a - d x))) = (1 - h d + h^2 d^2/2) x + h a - h^2 d a / 2
    hv, av, dv = 0.1, 2.0, 0.5
    assert np.allclose(A, 1 - hv * dv + hv**2 * dv**2 / 2)
    assert np.allclose(B, hv * av - hv**2 * dv * av / 2)


@pytest.mark.slow
def test_gradients_flow_through_assoc_scan():
    ts = jnp.linspace(0.0, 3.0, 31)
    x0 = jnp.ones((2, 3)) * 0.5

    def loss(theta):
        def prod_degr(stage_ts):
            a = jnp.broadcast_to(
                (theta * jnp.sin(stage_ts))[None, :, :, None], (2,) + stage_ts.shape + (3,)
            )
            d = jnp.broadcast_to(
                jnp.full_like(stage_ts, 0.4)[None, :, :, None], (2,) + stage_ts.shape + (3,)
            )
            return a + 1.0, d
        sol = solve_semilinear(prod_degr, x0, ts, method="midpoint")
        return jnp.sum(sol**2)

    g = jax.grad(loss)(jnp.asarray(0.7))
    assert np.isfinite(g)
    eps = 1e-3
    fd = (loss(jnp.asarray(0.7 + eps)) - loss(jnp.asarray(0.7 - eps))) / (2 * eps)
    assert np.allclose(g, fd, rtol=1e-2)
