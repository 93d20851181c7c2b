#!/usr/bin/env python
"""Summarize a jax.profiler trace (--profile-dir output): top ops by total
duration, per process/thread lane.

Usage: python scripts/trace_summary.py <profile_dir_or_trace.json.gz> [top_n]

Finds the newest ``*.trace.json.gz`` under the given directory and prints the
top-N trace events by accumulated duration for each lane (host Python lanes
vs device/XLA lanes are separate pids in the Chrome trace), so the device
lanes show which compiled XLA ops dominate a step.
"""

import collections
import glob
import gzip
import json
import os
import sys


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True))
    if not hits:
        raise SystemExit(f"no *.trace.json.gz under {path}")
    return hits[-1]


def main() -> None:
    path = find_trace(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    with gzip.open(path) as f:
        t = json.load(f)
    events = t.get("traceEvents", [])

    lane_names = {}  # pid -> process name
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            lane_names[e["pid"]] = e["args"].get("name", str(e["pid"]))

    by_lane = collections.defaultdict(collections.Counter)
    counts = collections.defaultdict(collections.Counter)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            key = e.get("name", "?")[:70]
            by_lane[e["pid"]][key] += e["dur"]
            counts[e["pid"]][key] += 1

    print(f"trace: {path}")
    for pid, tot in sorted(by_lane.items(), key=lambda kv: -sum(kv[1].values())):
        lane = lane_names.get(pid, str(pid))
        lane_total = sum(tot.values()) / 1e3
        print(f"\n=== lane {lane!r} (pid {pid}) — {lane_total:.1f} ms total ===")
        for name, d in tot.most_common(top_n):
            print(f"  {d / 1e3:10.2f} ms  x{counts[pid][name]:<6} {name}")


if __name__ == "__main__":
    main()
