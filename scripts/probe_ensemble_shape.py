"""Is the ensemble S>32 throughput regression member-axis-specific, or a
total-fused-shape effect?

Compares samples/sec over an (S, B) grid at matched total fused batch
S*B: if samples/s tracks S*B regardless of the split, the regression is a
shape/layout effect in the fused step (XLA choices at large operands); if
big-S small-B rows are specifically slower, the member axis itself (per-
member gathers, optimizer state, RNG) is the cost.

Usage: python scripts/probe_ensemble_shape.py [epochs]
"""

import json
import sys

sys.path.insert(0, ".")
import bench  # noqa: E402

epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 12
# matched-total pairs: (64,128) vs (16,512) at 8192; (128,128) vs (16,1024)
# at 16384 (kept small — each point is a fresh compile over the tunnel)
GRID = [(64, 128), (16, 512), (128, 128), (16, 1024)]
for S, B in GRID:
    n = max(810, 2 * B)  # at least 2 batches per epoch
    out = bench.bench_ensemble(S=S, epochs=epochs, n=n, batch=B)
    msps = out["ensemble_member_steps_per_sec"]
    row = {
        "S": S, "B": B, "total": S * B,
        "member_steps_per_sec": msps,
        "samples_per_sec": round(msps * B, 1),
    }
    print(json.dumps(row), flush=True)
