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


def test_auto_backend_dispatch():
    """backend='auto' picks by static shape at trace time: assoc off-TPU
    always; on TPU, pallas only in the wide HBM-bound regime. Numerics match
    the assoc path regardless of the choice."""
    import numpy as np

    from structured_latent_odes_tpu.ode.semilinear import (
        _PALLAS_MIN_LANES,
        _auto_scan_backend,
        solve_semilinear,
    )

    wide = jnp.zeros((_PALLAS_MIN_LANES // 8, 20, 8))
    narrow = jnp.zeros((16, 20, 8))
    if jax.default_backend() == "tpu":
        assert _auto_scan_backend(wide) == "pallas"
        assert _auto_scan_backend(narrow) == "assoc"
        # vmapped axes (particles/members) are invisible in the traced shape;
        # width_mult restores the physical lane count
        assert _auto_scan_backend(narrow, width_mult=_PALLAS_MIN_LANES) == "pallas"
        assert _auto_scan_backend(wide, width_mult=1) == "pallas"
    else:
        assert _auto_scan_backend(wide) == "assoc"
        assert _auto_scan_backend(wide, width_mult=64) == "assoc"

    r = np.random.RandomState(0)
    B, T, D = 4, 9, 3
    a_tab = jnp.asarray(r.rand(B, T - 1, 2, D).astype(np.float32))
    d_tab = jnp.asarray(r.rand(B, T - 1, 2, D).astype(np.float32))
    x0 = jnp.asarray(r.rand(B, D).astype(np.float32))
    ts = jnp.arange(float(T))
    prod_degr = lambda stage_ts: (a_tab, d_tab)
    s_auto = solve_semilinear(prod_degr, x0, ts, backend="auto")
    s_ref = solve_semilinear(prod_degr, x0, ts, backend="assoc")
    np.testing.assert_allclose(np.asarray(s_auto), np.asarray(s_ref), atol=1e-6)


def test_auto_backend_via_model_spec():
    """spec.backend='semilinear_auto' solves and matches the default."""
    import numpy as np

    from structured_latent_odes_tpu.nn.ode_model import (
        OdeModelSpec,
        ode_model_init,
        solve_ode,
    )

    base = OdeModelSpec(latent_dim=15, ode_state_dim=5, ode_hidden_dim=25)
    auto = OdeModelSpec(
        latent_dim=15, ode_state_dim=5, ode_hidden_dim=25, backend="semilinear_auto"
    )
    params = ode_model_init(jax.random.key(0), base)
    z = jax.random.normal(jax.random.key(1), (6, 15))
    ts = jnp.arange(0.0, 17.0)
    np.testing.assert_allclose(
        np.asarray(solve_ode(auto, params, z, ts)),
        np.asarray(solve_ode(base, params, z, ts)),
        atol=1e-6,
    )


def test_auto_fused_tier_pick():
    """The 'semilinear_auto' third tier (whole-solve fused kernel) engages
    only on TPU, only for fixed-step tableaus, and only past the measured
    wide crossover (docs/PERFORMANCE.md fused table: pallas scan still wins
    at S=64 x B=128 = 40,960 lanes; fused wins at S=128 = 81,920)."""
    from structured_latent_odes_tpu.nn.ode_model import (
        _FUSED_MIN_LANES,
        OdeModelSpec,
        _auto_picks_fused,
    )

    mk = lambda **kw: OdeModelSpec(
        latent_dim=15, ode_state_dim=5, ode_hidden_dim=25,
        backend="semilinear_auto", **kw,
    )
    z = jnp.zeros((128, 15))  # per-member batch 128, D=5
    wide = mk(auto_width_mult=_FUSED_MIN_LANES // (128 * 5) + 1)
    narrow = mk(auto_width_mult=64)  # 40,960 lanes: pallas regime
    if jax.default_backend() == "tpu":
        assert _auto_picks_fused(wide, z)
        assert not _auto_picks_fused(narrow, z)
        # adaptive solvers have no fixed-step tableau walk in the kernel
        assert not _auto_picks_fused(
            mk(auto_width_mult=1024, solver="dopri5"), z
        )
    else:
        assert not _auto_picks_fused(wide, z)


def test_auto_width_mult_plumbing():
    """num_particles (vmapped in make_dual_step) and the sweep's member count
    (config.auto_width_mult) both reach the ode spec's width hint."""
    from structured_latent_odes_tpu.data.configs import load_cvs_config
    from structured_latent_odes_tpu.models import cvs_spec

    config = load_cvs_config()
    config.num_particles = 2
    config.auto_width_mult = 5
    spec = cvs_spec(config, n_time=8)
    assert spec.decoder.ode.auto_width_mult == 10

    config2 = load_cvs_config()
    spec2 = cvs_spec(config2, n_time=8)
    assert spec2.decoder.ode.auto_width_mult == 1
