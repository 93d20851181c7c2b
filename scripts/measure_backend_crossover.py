"""Measure the assoc-vs-pallas crossover for the semilinear affine scan.

Times a full value_and_grad through ``solve_semilinear`` (the training-path
usage) at a ladder of flattened lane widths (batch * state_dim) on the real
device, prints per-shape timings for backend in {assoc, pallas, auto}, and
reports the measured crossover. The result calibrates
``ode.semilinear._PALLAS_MIN_LANES`` (backend='auto' dispatch).

Run on TPU:  python scripts/measure_backend_crossover.py [--t 86] [--d 4]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from structured_latent_odes_tpu.ode.semilinear import (
    _PALLAS_MIN_LANES,
    solve_semilinear,
)


def time_backend(backend: str, B: int, T: int, D: int, S: int = 2, reps: int = 20):
    r = np.random.RandomState(0)
    a_tab = jnp.asarray(r.rand(B, T - 1, S, D).astype(np.float32))
    d_tab = jnp.asarray(r.rand(B, T - 1, S, D).astype(np.float32))
    x0 = jnp.asarray(r.rand(B, D).astype(np.float32))
    ts = jnp.arange(float(T))

    def loss(a_tab, d_tab, x0):
        sol = solve_semilinear(
            lambda stage_ts: (a_tab, d_tab), x0, ts, backend=backend
        )
        return jnp.sum(sol**2)

    f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
    out = f(a_tab, d_tab, x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(a_tab, d_tab, x0)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, default=86)
    p.add_argument("--d", type=int, default=4)
    args = p.parse_args()

    print(f"device={jax.devices()[0]}  T={args.t} D={args.d}  "
          f"current _PALLAS_MIN_LANES={_PALLAS_MIN_LANES}")
    rows = []
    crossover = None
    for logb in range(4, 18):
        B = 1 << logb
        lanes = B * args.d
        t_assoc = time_backend("assoc", B, args.t, args.d)
        t_pallas = time_backend("pallas", B, args.t, args.d)
        t_auto = time_backend("auto", B, args.t, args.d)
        winner = "pallas" if t_pallas < t_assoc else "assoc"
        auto_ok = t_auto <= 1.10 * min(t_assoc, t_pallas)
        rows.append(
            dict(B=B, lanes=lanes, assoc_us=t_assoc * 1e6, pallas_us=t_pallas * 1e6,
                 auto_us=t_auto * 1e6, winner=winner, auto_within_10pct=auto_ok)
        )
        if crossover is None and t_pallas < t_assoc:
            crossover = lanes
        print(f"B={B:>7} lanes={lanes:>8}  assoc {t_assoc*1e6:8.1f}us  "
              f"pallas {t_pallas*1e6:8.1f}us  auto {t_auto*1e6:8.1f}us  "
              f"winner={winner}  auto_ok={auto_ok}")
    print(json.dumps({"crossover_lanes": crossover, "rows": rows}))


if __name__ == "__main__":
    main()
