"""Pallas kernel tests (interpreter mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from structured_latent_odes_tpu.ode import solve_affine_sequential
from structured_latent_odes_tpu.ops.recurrence import affine_scan_pallas


def _rand(shape, key, lo=0.85, hi=1.05):
    return jax.random.uniform(jax.random.key(key), shape, minval=lo, maxval=hi)


def test_pallas_scan_matches_sequential():
    Bt, T, D = 12, 30, 5
    A = _rand((Bt, T, D), 0)
    B = _rand((Bt, T, D), 1, -0.1, 0.1)
    x0 = _rand((Bt, D), 2, -1, 1)
    out = affine_scan_pallas(A, B, x0)
    ref = solve_affine_sequential(
        jnp.moveaxis(A, 1, 0), jnp.moveaxis(B, 1, 0), x0
    )  # (T+1, Bt, D)
    assert out.shape == (Bt, T + 1, D)
    assert np.allclose(out, jnp.moveaxis(ref, 0, 1), rtol=1e-5, atol=1e-5)


def test_pallas_scan_large_padding():
    """M not a multiple of 1024 exercises the padding path."""
    Bt, T, D = 37, 11, 3  # M = 111
    A = _rand((Bt, T, D), 3)
    B = _rand((Bt, T, D), 4, -0.2, 0.2)
    x0 = _rand((Bt, D), 5, -1, 1)
    out = affine_scan_pallas(A, B, x0)
    ref = solve_affine_sequential(jnp.moveaxis(A, 1, 0), jnp.moveaxis(B, 1, 0), x0)
    assert np.allclose(out, jnp.moveaxis(ref, 0, 1), rtol=1e-5, atol=1e-5)


def test_pallas_scan_gradients():
    Bt, T, D = 4, 9, 2
    A = _rand((Bt, T, D), 6)
    B = _rand((Bt, T, D), 7, -0.3, 0.3)
    x0 = _rand((Bt, D), 8, -1, 1)

    def loss_pallas(A, B, x0):
        return jnp.sum(affine_scan_pallas(A, B, x0) ** 2)

    def loss_ref(A, B, x0):
        ref = solve_affine_sequential(jnp.moveaxis(A, 1, 0), jnp.moveaxis(B, 1, 0), x0)
        return jnp.sum(ref**2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(A, B, x0)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(A, B, x0)
    for a, b in zip(gp, gr):
        assert np.allclose(a, b, rtol=1e-4, atol=1e-4)


def test_semilinear_pallas_backend():
    """solve_semilinear(backend='pallas') matches the assoc backend."""
    from structured_latent_odes_tpu.ode import solve_semilinear

    ts = jnp.linspace(0.0, 5.0, 40)
    B, D = 6, 4
    x0 = jax.random.uniform(jax.random.key(9), (B, D))

    def prod_degr(stage_ts):
        a = jnp.broadcast_to(
            (jnp.sin(stage_ts) * 0.5 + 1.0)[None, :, :, None], (B,) + stage_ts.shape + (D,)
        )
        d = jnp.broadcast_to(
            (jnp.cos(stage_ts) * 0.3 + 0.6)[None, :, :, None], (B,) + stage_ts.shape + (D,)
        )
        return a, d

    s1 = solve_semilinear(prod_degr, x0, ts, backend="assoc")
    s2 = solve_semilinear(prod_degr, x0, ts, backend="pallas")
    assert np.allclose(s1, s2, rtol=1e-5, atol=1e-5)
