#!/bin/bash
# Copy each ensemble sweep's compact summary (sweep.json: config + per-member
# best-epoch metrics) into the tracked runs_evidence/ tree so headline-table
# evidence survives workspace resets (runs/ itself is gitignored and was
# wiped once mid-round-3 by a reset).
set -u
cd /root/repo
for tree in r3 repro; do
  for f in runs/$tree/*/sweep.json; do
    [ -e "$f" ] || continue
    name=$(basename "$(dirname "$f")")
    mkdir -p runs_evidence/$tree
    cp "$f" "runs_evidence/$tree/$name.sweep.json"
  done
done
ls runs_evidence/*/ | wc -l
