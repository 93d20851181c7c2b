"""On-TPU numeric check of the 'semilinear_auto' third tier (fused kernel).

Asserts the auto dispatch picks the fused whole-solve kernel past the wide
crossover and that forward + gradients match the assoc path at production
CVS shapes. Run on the TPU backend; prints one summary line per check.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from structured_latent_odes_tpu.nn.ode_model import (
    OdeModelSpec,
    _auto_picks_fused,
    ode_model_init,
    solve_ode,
)

t0 = time.time()


def log(m):
    print(f"[{time.time() - t0:.1f}s]", m, flush=True)


base = OdeModelSpec(latent_dim=15, ode_state_dim=5, ode_hidden_dim=25)
auto = OdeModelSpec(
    latent_dim=15, ode_state_dim=5, ode_hidden_dim=25,
    backend="semilinear_auto", auto_width_mult=256,
)
params = ode_model_init(jax.random.key(0), base)
z = jax.random.normal(jax.random.key(1), (128, 15))
ts = jnp.arange(0.0, 20.0)
log(f"picks fused: {_auto_picks_fused(auto, z)}")
assert _auto_picks_fused(auto, z) == (jax.default_backend() == "tpu")

fa = jax.jit(lambda p: solve_ode(auto, p, z, ts))
fb = jax.jit(lambda p: solve_ode(base, p, z, ts))
ra = fa(params)
ra.block_until_ready()
log("fused fwd done")
rb = fb(params)
rb.block_until_ready()
log("assoc fwd done")
fwd_diff = float(jnp.max(jnp.abs(ra - rb)))
log(f"fwd max abs diff: {fwd_diff}")

la = jax.jit(jax.grad(lambda p: jnp.sum(solve_ode(auto, p, z, ts) ** 2)))
lb = jax.jit(jax.grad(lambda p: jnp.sum(solve_ode(base, p, z, ts) ** 2)))
ga = la(params)
jax.block_until_ready(ga)
log("fused grad done")
gb = lb(params)
jax.block_until_ready(gb)
log("assoc grad done")
rel = max(
    float(jnp.max(jnp.abs(x - y)) / (jnp.max(jnp.abs(y)) + 1e-12))
    for x, y in zip(jax.tree.leaves(ga), jax.tree.leaves(gb))
)
log(f"grad max rel diff: {rel}")
assert fwd_diff < 1e-3 and rel < 1e-3
log("OK")
