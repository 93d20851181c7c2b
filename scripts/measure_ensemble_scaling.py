"""Ensemble trainer scaling curve: aggregate member-steps/sec vs S.

How far does one v5e chip stretch on concurrent full training runs
(train/ensemble.py)? Reuses bench.bench_ensemble at S = 8..128 and prints
one JSON line per S (member-steps/sec, implied aggregate MFU using the
XLA-counted per-step FLOPs from bench.py's main row).

Usage: python scripts/measure_ensemble_scaling.py [--backend NAME] [S ...]
"""

import json
import sys

sys.path.insert(0, ".")
import bench  # noqa: E402

FLOPS_PER_STEP = 142347968.0  # XLA-counted, bench.py cvs_elbo main row
V5E_BF16_PEAK = 197e12  # same constant bench.py's mfu rows use

args = sys.argv[1:]
backend = None
if args and args[0] == "--backend":
    backend = args[1]
    args = args[2:]
sizes = [int(a) for a in args] or [8, 16, 32, 64, 128]
rows = []
for S in sizes:
    out = bench.bench_ensemble(S=S, ode_backend=backend)
    msps = out["ensemble_member_steps_per_sec"]
    row = {
        "S": S,
        "member_steps_per_sec": msps,
        "aggregate_mfu": round(msps * FLOPS_PER_STEP / V5E_BF16_PEAK, 6),
    }
    rows.append(row)
    print(json.dumps(row), flush=True)

best = max(rows, key=lambda r: r["member_steps_per_sec"])
print(json.dumps({"best": best}))
