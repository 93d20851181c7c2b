"""Solver-core oracle tests: closed forms, scipy, convergence order, adjoint.

The reference ships no tests; strategy per SURVEY.md §4 — fixed-step order
checks on closed-form ODEs, scipy as the nonlinear oracle, and
adjoint-vs-discretize gradient checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import integrate as scipy_integrate

from structured_latent_odes_tpu.ode import (
    odeint,
    odeint_adaptive,
    odeint_adjoint,
)


def test_exponential_decay_closed_form():
    ts = jnp.linspace(0.0, 2.0, 41)
    y0 = jnp.array([1.0, 2.0, -0.5])
    f = lambda t, y: -y
    exact = y0[None] * jnp.exp(-ts)[:, None]
    for method, tol in [("euler", 5e-2), ("midpoint", 2e-3), ("rk4", 1e-6), ("dopri5", 1e-7)]:
        ys = odeint(f, y0, ts, method=method)
        assert np.allclose(ys, exact, atol=tol), method


@pytest.mark.parametrize("method,order", [("euler", 1), ("midpoint", 2), ("rk4", 4)])
def test_convergence_order(method, order):
    """Halving the step size must reduce the error by ~2^order."""
    y0 = jnp.array([1.0])
    f = lambda t, y: -1.3 * y + jnp.sin(t)
    errs = []
    # rk4 hits the float32 error floor on fine grids — use coarse ones
    ns = (4, 8, 16) if method == "rk4" else (20, 40, 80)
    for n in ns:
        ts = jnp.linspace(0.0, 2.0, n + 1)
        ys = odeint(f, y0, ts, method=method)
        # exact solution of y' = -a y + sin t
        a = 1.3
        t_end = 2.0
        c = 1.0 + 1.0 / (a**2 + 1.0)
        exact = c * np.exp(-a * t_end) + (a * np.sin(t_end) - np.cos(t_end)) / (a**2 + 1.0)
        errs.append(abs(float(ys[-1, 0]) - exact))
    rate1 = np.log2(errs[0] / errs[1])
    rate2 = np.log2(errs[1] / errs[2])
    assert rate1 > order - 0.5 and rate2 > order - 0.5, (method, errs)


def test_nonlinear_vs_scipy_oracle():
    """Van der Pol-ish nonlinear system vs scipy solve_ivp (LSODA-class oracle)."""

    def f_np(t, y):
        return np.array([y[1], (1.0 - y[0] ** 2) * y[1] - y[0]])

    def f_jax(t, y):
        return jnp.stack([y[1], (1.0 - y[0] ** 2) * y[1] - y[0]])

    ts = np.linspace(0.0, 5.0, 201)
    y0 = np.array([1.0, 0.0])
    ref = scipy_integrate.solve_ivp(f_np, (0, 5.0), y0, t_eval=ts, rtol=1e-10, atol=1e-10).y.T
    ys_rk4 = odeint(f_jax, jnp.asarray(y0, dtype=jnp.float32), jnp.asarray(ts, dtype=jnp.float32), method="rk4")
    assert np.allclose(ys_rk4, ref, atol=2e-4)
    ys_ad = odeint_adaptive(
        f_jax, jnp.asarray(y0, dtype=jnp.float32), jnp.asarray(ts, dtype=jnp.float32), rtol=1e-6, atol=1e-8
    )
    assert np.allclose(ys_ad, ref, atol=2e-3)


def test_batched_solve_matches_loop():
    """A (B, D) batched solve equals per-sample solves.

    Pinned to matmul precision "highest": the invariant under test is that
    the solver treats batch rows independently, and at the platform default
    the (B,D)@(D,D) matmul inside ``f`` itself differs from the (D,)@(D,D)
    matvec by ~1e-3 relative (jax>=0.9 relaxed CPU matmul), which the 30
    steps then amplify — a property of the platform's matmul, not of the
    solver's batching.
    """
    key = jax.random.key(0)
    y0 = jax.random.normal(key, (7, 3))
    W = jax.random.normal(jax.random.key(1), (3, 3)) * 0.3
    f = lambda t, y: jnp.tanh(y @ W) - 0.1 * y
    ts = jnp.linspace(0.0, 3.0, 31)
    with jax.default_matmul_precision("highest"):
        batched = odeint(f, y0, ts, method="midpoint")
        for i in range(7):
            single = odeint(f, y0[i], ts, method="midpoint")
            assert np.allclose(batched[:, i], single, atol=1e-5)


def test_remat_matches_plain():
    y0 = jnp.ones((4, 2))
    f = lambda t, y: jnp.sin(y) - 0.2 * y * t
    ts = jnp.linspace(0.0, 1.0, 11)

    def loss(y0, remat):
        return jnp.sum(odeint(f, y0, ts, method="midpoint", remat=remat) ** 2)

    g_plain = jax.grad(lambda y: loss(y, False))(y0)
    g_remat = jax.grad(lambda y: loss(y, True))(y0)
    assert np.allclose(g_plain, g_remat, atol=1e-6)


def test_adjoint_gradients_match_discretize():
    """Continuous adjoint grads ≈ discretize-then-optimize grads (same grid)."""
    W = jax.random.normal(jax.random.key(2), (3, 3)) * 0.2
    b = jax.random.normal(jax.random.key(3), (3,)) * 0.1
    y0 = jax.random.normal(jax.random.key(4), (5, 3))
    ts = jnp.linspace(0.0, 1.0, 21)

    def f(t, y, args):
        W_, b_ = args
        return jnp.tanh(y @ W_ + b_) - 0.3 * y

    def loss_adj(y0, args):
        return jnp.sum(odeint_adjoint(f, y0, ts, args, method="midpoint") ** 2)

    def loss_dis(y0, args):
        return jnp.sum(odeint(lambda t, y: f(t, y, args), y0, ts, method="midpoint") ** 2)

    ga = jax.grad(loss_adj, argnums=(0, 1))(y0, (W, b))
    gd = jax.grad(loss_dis, argnums=(0, 1))(y0, (W, b))
    # continuous adjoint ~ discrete gradient + O(h^2): loose tolerance
    assert np.allclose(ga[0], gd[0], rtol=2e-2, atol=1e-2)
    assert np.allclose(ga[1][0], gd[1][0], rtol=2e-2, atol=1e-2)
    assert np.allclose(ga[1][1], gd[1][1], rtol=2e-2, atol=1e-2)


def test_decreasing_time_grid():
    """Fixed-step solvers integrate backwards when ts decreases."""
    ts = jnp.linspace(2.0, 0.0, 41)
    y0 = jnp.array([np.exp(-2.0)])
    f = lambda t, y: -y
    ys = odeint(f, y0, ts, method="rk4")
    assert np.allclose(ys[-1], 1.0, atol=1e-5)


def test_per_sample_adaptive_matches_per_sample_solves():
    """Per-sample step control: heterogeneous decay rates, each row must
    match its own independent adaptive solve."""
    from structured_latent_odes_tpu.ode.solvers import odeint_adaptive_per_sample

    rates = jnp.asarray([0.1, 1.0, 25.0])[:, None]  # very different stiffness
    y0 = jnp.ones((3, 2))
    ts = jnp.linspace(0.0, 1.0, 11)
    f = lambda t, y: -rates * y
    ys = odeint_adaptive_per_sample(f, y0, ts, rtol=1e-6, atol=1e-9)
    exact = jnp.exp(-rates[None] * ts[:, None, None]) * y0[None]
    assert np.allclose(ys, exact, atol=5e-5), np.abs(ys - exact).max()


def test_chunked_remat_matches_plain():
    """O(sqrt T) chunked rematerialization: same values and gradients."""
    y0 = jnp.ones((3, 2)) * 0.4
    f = lambda t, y: jnp.cos(y) - 0.3 * y
    ts = jnp.linspace(0.0, 2.0, 24)  # 23 steps, not a perfect square

    ys_plain = odeint(f, y0, ts)
    ys_chunk = odeint(f, y0, ts, remat="chunked")
    assert np.allclose(ys_plain, ys_chunk, atol=1e-6)

    g_plain = jax.grad(lambda y: jnp.sum(odeint(f, y, ts) ** 2))(y0)
    g_chunk = jax.grad(lambda y: jnp.sum(odeint(f, y, ts, remat="chunked") ** 2))(y0)
    assert np.allclose(g_plain, g_chunk, atol=1e-5)


@pytest.mark.slow
def test_adaptive_backends_reachable_from_model_path():
    """OdeModelSpec(backend='adaptive'/'adaptive_per_sample') solves and
    differentiates through the SAME model surface training uses, agreeing
    with the fixed-step generic path (reference odeint ``method`` menu,
    blackbox_ode.py:41-45)."""
    import jax

    from structured_latent_odes_tpu.nn.ode_model import (
        OdeModelSpec,
        ode_model_init,
        solve_ode,
    )

    ts = jnp.arange(0.0, 24.0)
    params = ode_model_init(
        jax.random.key(0), OdeModelSpec(latent_dim=6, ode_state_dim=4, ode_hidden_dim=8)
    )
    z = jax.random.normal(jax.random.key(1), (5, 6))

    ref_spec = OdeModelSpec(6, 4, 8, solver="rk4", backend="generic")
    sol_ref = solve_ode(ref_spec, params, z, ts)

    for backend in ("adaptive", "adaptive_per_sample"):
        spec = OdeModelSpec(6, 4, 8, backend=backend, rtol=1e-6, atol=1e-8)
        sol = jax.jit(lambda p, z: solve_ode(spec, p, z, ts))(params, z)
        assert sol.shape == sol_ref.shape
        np.testing.assert_allclose(np.asarray(sol), np.asarray(sol_ref), rtol=5e-3, atol=5e-3)

    # gradients flow (training-path requirement)
    spec = OdeModelSpec(6, 4, 8, backend="adaptive")
    g = jax.grad(lambda z: jnp.sum(solve_ode(spec, params, z, ts) ** 2))(z)
    assert np.all(np.isfinite(np.asarray(g))) and float(jnp.sum(jnp.abs(g))) > 0


@pytest.mark.slow
def test_adaptive_backend_through_elbo():
    """The full ELBO trains with an adaptive decoder backend."""
    import jax

    from structured_latent_odes_tpu.data.configs import load_cvs_config
    from structured_latent_odes_tpu.models import cvs_spec, elbo_main, init_params

    config = load_cvs_config()
    config.seq_len = 16
    config.ode_backend = "adaptive"
    spec = cvs_spec(config, n_time=16)
    params = init_params(jax.random.key(0), spec)
    rng = np.random.RandomState(0)
    batch = {
        "observations": jnp.asarray(rng.rand(4, 3, 16), jnp.float32),
        "iext": jnp.asarray((rng.rand(4, 1) > 0.5).astype(np.float32)),
        "rtpr": jnp.asarray((rng.rand(4, 1) > 0.5).astype(np.float32)),
        "mask": jnp.ones((4,), jnp.float32),
    }
    loss, mets = elbo_main(spec, params, jax.random.key(1), batch, jnp.arange(16.0))
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: elbo_main(spec, p, jax.random.key(1), batch, jnp.arange(16.0))[0])(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))
