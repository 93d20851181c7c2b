"""Long-horizon (T=4096) scaling: single-chip remat vs 8-way time sharding.

VERDICT r2 item 8 asks where sequence parallelism pays. Multi-chip hardware
is not available in this environment (one v5e chip via a tunnel), so this
script produces the honest decomposition:

1. REAL single-chip wall-clock for a T=4096 semilinear grad step, plain vs
   O(sqrt(T))-remat (run with the default axon env).
2. XLA's compiled per-device memory analysis for the same computation
   single-device vs 8-way time-sharded on the virtual CPU mesh — actual
   compiler numbers (temp/argument bytes), valid on any backend because they
   are a property of the partitioned program, not the silicon.
3. The communication volume of the time-sharded solve (all-gather bytes per
   step from the HLO), checked to be T-INDEPENDENT — the design property that
   makes the approach scale (parallel/timepar.py's blocked prefix scan
   exchanges only (B, D) chunk totals).

Run TPU part:  python scripts/bench_longhorizon.py --tpu
Run mesh part: SLODE_TEST_REEXEC=1 JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/bench_longhorizon.py --mesh
"""

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from structured_latent_odes_tpu.nn.ode_model import (
    OdeModelSpec,
    dynamics_prod_degr,
    initialize_state,
    ode_model_init,
)

B, L, D, H = 256, 15, 5, 25
SPEC = OdeModelSpec(latent_dim=L, ode_state_dim=D, ode_hidden_dim=H)


def _loss_semilinear(params, z, ts):
    from structured_latent_odes_tpu.ode.semilinear import solve_semilinear

    x0 = initialize_state(params, z)
    sol = solve_semilinear(
        lambda stage_ts: dynamics_prod_degr(params, stage_ts, z), x0, ts
    )
    return jnp.mean(sol**2)


def _loss_timepar(params, z, ts, mesh):
    from structured_latent_odes_tpu.parallel.timepar import solve_semilinear_timepar

    x0 = initialize_state(params, z)
    sol = solve_semilinear_timepar(
        dynamics_prod_degr, params, z, x0, ts,
        mesh=mesh, time_axis="model", batch_axis=None,
    )
    return jnp.mean(sol**2)


def _timeit(f, *args, reps=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def tpu_part(T):
    params = ode_model_init(jax.random.key(0), SPEC)
    z = jax.random.normal(jax.random.key(1), (B, L))
    ts = jnp.arange(float(T))
    out = {"T": T, "B": B}
    grad_plain = jax.jit(jax.grad(lambda p: _loss_semilinear(p, z, ts)))
    out["grad_step_ms_plain"] = round(_timeit(grad_plain, params) * 1e3, 2)

    from structured_latent_odes_tpu.ode import odeint
    from structured_latent_odes_tpu.nn.ode_model import dynamics_rhs

    def loss_remat(p):
        x0 = initialize_state(p, z)
        sol = odeint(lambda t, x: dynamics_rhs(p, t, x, z), x0, ts, remat="chunked")
        return jnp.mean(sol**2)

    grad_remat = jax.jit(jax.grad(loss_remat))
    out["grad_step_ms_chunked_remat"] = round(_timeit(grad_remat, params) * 1e3, 2)
    return out


def _mem(compiled):
    m = compiled.memory_analysis()
    return {
        "temp_bytes": int(m.temp_size_in_bytes),
        "argument_bytes": int(m.argument_size_in_bytes),
        "output_bytes": int(m.output_size_in_bytes),
    }


def _collective_bytes(compiled):
    """Sum of all-gather/all-reduce result bytes in the optimized HLO."""
    txt = compiled.as_text()
    total = 0
    for m in re.finditer(r"f32\[([\d,]*)\][^\n]*(all-gather|all-reduce)", txt):
        dims = [int(d) for d in m.group(1).split(",") if d]
        total += 4 * int(np.prod(dims)) if dims else 4
    return total


def mesh_part(Ts):
    from structured_latent_odes_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) >= 8, "run with the 8-device virtual CPU mesh env"
    mesh = make_mesh(n_data=1, n_model=8)
    params = ode_model_init(jax.random.key(0), SPEC)
    z = jax.random.normal(jax.random.key(1), (B, L))
    rows = []
    for T in Ts:
        ts = jnp.arange(float(T))
        single = jax.jit(jax.grad(lambda p: _loss_semilinear(p, z, ts))).lower(params).compile()
        sharded = (
            jax.jit(jax.grad(lambda p: _loss_timepar(p, z, ts, mesh)))
            .lower(params)
            .compile()
        )
        row = {
            "T": T,
            "single_device": _mem(single),
            "time_sharded_8way_per_device": _mem(sharded),
            "sharded_collective_bytes_per_step": _collective_bytes(sharded),
        }
        row["temp_memory_ratio"] = round(
            row["single_device"]["temp_bytes"]
            / max(row["time_sharded_8way_per_device"]["temp_bytes"], 1),
            2,
        )
        rows.append(row)
        print(json.dumps(row))
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tpu", action="store_true")
    p.add_argument("--mesh", action="store_true")
    p.add_argument("--t", type=int, default=4096)
    args = p.parse_args()
    if args.tpu:
        print(json.dumps({"tpu_single_chip": tpu_part(args.t)}))
    if args.mesh:
        mesh_part([1024, args.t])


if __name__ == "__main__":
    main()
