"""Fused whole-solve Pallas kernel (ops/fused_step.py): forward, hand-derived
VJP, and vmap (ensemble) parity against the sequential semilinear backend.

Interpreter mode on CPU; the same code path compiles on TPU (verified in the
round-5 on-chip smoke: fwd 5e-5, grad rel 1.5e-5 vs the assoc backend at the
production CVS shapes).
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from structured_latent_odes_tpu.nn.ode_model import (
    OdeModelSpec,
    ode_model_init,
    solve_ode,
)

L, D, H = 15, 5, 25


def _specs(method):
    mk = lambda backend: OdeModelSpec(
        latent_dim=L, ode_state_dim=D, ode_hidden_dim=H,
        solver=method, backend=backend,
    )
    return mk("semilinear_seq"), mk("semilinear_fused")


@pytest.mark.parametrize("method", ["euler", "midpoint", "heun", "rk4"])
def test_fused_forward_matches_sequential(method):
    spec_ref, spec_fus = _specs(method)
    params = ode_model_init(jax.random.key(0), spec_ref)
    z = jax.random.normal(jax.random.key(1), (13, L))
    ts = jnp.arange(0.0, 21.0)
    ref = solve_ode(spec_ref, params, z, ts)
    fus = solve_ode(spec_fus, params, z, ts)
    assert fus.shape == ref.shape == (13, 21, D)
    assert np.allclose(fus, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("method", ["midpoint", "rk4"])
def test_fused_gradients_match_autodiff(method):
    """The hand-derived backward (adjoint recurrence + stage recompute +
    weight-grad accumulation) against XLA autodiff of the sequential path.

    Tolerance is set by f32 accumulation order, not correctness: both f32
    paths sit ~1.7e-3 max-relative from an f64 oracle of the same gradient
    (measured round 5), with the fused kernel marginally CLOSER to it.
    """
    spec_ref, spec_fus = _specs(method)
    params = ode_model_init(jax.random.key(0), spec_ref)
    z = jax.random.normal(jax.random.key(1), (9, L))
    ts = jnp.arange(0.0, 17.0)

    def loss(spec):
        def f(p, zz):
            sol = solve_ode(spec, p, zz, ts)
            return jnp.sum(jnp.sin(sol) * sol)
        return f

    g_ref = jax.grad(loss(spec_ref), argnums=(0, 1))(params, z)
    g_fus = jax.grad(loss(spec_fus), argnums=(0, 1))(params, z)
    a, _ = jax.flatten_util.ravel_pytree(g_fus)
    b, _ = jax.flatten_util.ravel_pytree(g_ref)
    scale = jnp.maximum(jnp.max(jnp.abs(b)), 1.0)
    assert float(jnp.max(jnp.abs(a - b)) / scale) < 5e-3


def test_fused_vmap_members():
    """vmap over a member axis (params AND data batched) — the ensemble
    trainer's usage — must match per-member sequential solves."""
    S = 3
    spec_ref, spec_fus = _specs("midpoint")
    ps = [ode_model_init(jax.random.key(i), spec_fus) for i in range(S)]
    params = jax.tree.map(lambda *x: jnp.stack(x), *ps)
    z = jax.random.normal(jax.random.key(9), (S, 7, L))
    ts = jnp.arange(0.0, 12.0)

    vf = jax.vmap(lambda p, zz: solve_ode(spec_fus, p, zz, ts))
    out = vf(params, z)
    for s in range(S):
        ref = solve_ode(spec_ref, ps[s], z[s], ts)
        assert np.allclose(out[s], ref, rtol=1e-5, atol=1e-5)

    # grads flow through the vmapped kernel to every member's params
    g = jax.grad(lambda p: jnp.sum(jnp.cos(vf(p, z))))(params)
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert bool(jnp.all(jnp.isfinite(flat))) and float(jnp.max(jnp.abs(flat))) > 0


def test_fused_padding_edges():
    """Batch not a lane multiple + T=2 minimal horizon exercise padding."""
    spec_ref, spec_fus = _specs("midpoint")
    params = ode_model_init(jax.random.key(3), spec_ref)
    z = jax.random.normal(jax.random.key(4), (130, L))  # 130 > 128 lanes
    ts = jnp.arange(0.0, 2.0)
    ref = solve_ode(spec_ref, params, z, ts)
    fus = solve_ode(spec_fus, params, z, ts)
    assert np.allclose(fus, ref, rtol=1e-5, atol=1e-5)
