"""Roofline for the fused ensemble trainer: is the S>32 droop HBM-bound?

For each S (B fixed at the CVS headline 128), lowers the full ensemble
epoch-scan `runner.run` once, reads XLA's own cost analysis of the compiled
program (total flops + bytes accessed across the whole scan), times the
execution, and reports achieved GFLOP/s and GB/s against v5e peaks
(197 TFLOP/s bf16 MXU, 819 GB/s HBM).

Interpretation (docs/PERFORMANCE.md): if achieved GB/s plateaus near a
fixed ceiling while samples/s falls as S grows, the member axis is
bandwidth-bound — the droop is bytes/step growth hitting a fixed-bandwidth
roof, not a fixable layout bug.

Usage: python scripts/roofline_ensemble.py [epochs]
"""

import json
import sys
import time

sys.path.insert(0, ".")
import bench  # noqa: E402  (reuses the exact bench_ensemble setup)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from structured_latent_odes_tpu.data.configs import load_cvs_config
from structured_latent_odes_tpu.models import cvs_spec, init_params_fast
from structured_latent_odes_tpu.train.ensemble import (
    build_epoch_perms,
    make_ensemble_runner,
    stack_members,
)

V5E_PEAK_FLOPS = 197e12
V5E_PEAK_HBM = 819e9

epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 12
B, n, n_time = 128, 810, 86

config = load_cvs_config()
config.seq_len = n_time
config.mini_batch_size = B
spec = cvs_spec(config, n_time=n_time)
r = np.random.RandomState(0)
split = {
    "observations": r.rand(n, 3, n_time).astype(np.float32),
    "iext": (r.rand(n, 1) > 0.5).astype(np.float32),
    "rtpr": (r.rand(n, 1) > 0.5).astype(np.float32),
}
ts = jnp.arange(float(n_time))
train_splits = {k: jnp.asarray(v) for k, v in split.items()}

for S in (8, 16, 32, 64, 128):
    runner = make_ensemble_runner(
        spec, ts, config.learning_rate,
        init_params_fast(jax.random.key(0), spec), policy="challenge",
        shared_data=True,
    )
    members, perms_l = [], []
    for s in range(S):
        params = init_params_fast(jax.random.key(s), spec)
        members.append(runner.init_state(params, jax.random.key(100 + s)))
        perms, mask = build_epoch_perms(n, B, epochs - 1, np.random.RandomState(s))
        perms_l.append(perms)
    states = stack_members(members)
    eval_keys = jnp.stack([jax.random.key(200 + s) for s in range(S)])
    perms = jnp.asarray(np.stack(perms_l))
    mask_d = jnp.asarray(mask)
    aux = jnp.ones((S, epochs), np.float32) * 46.0

    fn = jax.jit(lambda st, ek, pm: runner.run(
        st, ek, train_splits, None, pm, mask_d, aux))
    lowered = fn.lower(states, eval_keys, perms)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    # Execute the AOT-compiled object itself: the analyzed and timed
    # programs are then the same executable, and the epoch scans compile
    # exactly once (fn(...) would trace+compile a second executable since
    # lower().compile() does not populate the jit cache — ADVICE r4).
    res = compiled(states, eval_keys, perms)
    jax.block_until_ready(res.best_crit)  # warm
    t0 = time.perf_counter()
    res = compiled(states, eval_keys, perms)
    jax.block_until_ready(res.best_crit)
    dt = time.perf_counter() - t0

    n_batches = perms.shape[2]
    member_steps = S * epochs * n_batches
    row = {
        "S": S,
        "member_steps_per_sec": round(member_steps / dt, 1),
        "samples_per_sec": round(member_steps / dt * B, 1),
        "xla_flops_total": flops,
        "xla_bytes_total": bytes_acc,
        "achieved_gflops": round(flops / dt / 1e9, 1),
        "achieved_gbs": round(bytes_acc / dt / 1e9, 1),
        "pct_hbm_peak": round(100 * bytes_acc / dt / V5E_PEAK_HBM, 1),
        "pct_mxu_peak": round(100 * flops / dt / V5E_PEAK_FLOPS, 2),
        "bytes_per_member_step": round(bytes_acc / member_steps),
    }
    print(json.dumps(row), flush=True)
