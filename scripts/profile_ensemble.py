"""Capture a device trace of the ensemble trainer at a given S.

Usage: python scripts/profile_ensemble.py S [logdir]
Then: python scripts/trace_summary.py <logdir> 25

Used to diagnose the member-axis scaling regression past S≈32
(docs/PERFORMANCE.md scaling table): the trace shows which XLA ops grow
superlinearly in S.
"""

import sys

sys.path.insert(0, ".")
import bench  # noqa: E402

S = int(sys.argv[1]) if len(sys.argv) > 1 else 16
logdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/ens_trace_s{S}"

# warm up / compile outside the trace
out = bench.bench_ensemble(S=S, epochs=4)
print("warmup:", out)

from structured_latent_odes_tpu.utils.profiling import trace  # noqa: E402

with trace(logdir):
    out = bench.bench_ensemble(S=S, epochs=4)
print("traced:", out, "->", logdir)
