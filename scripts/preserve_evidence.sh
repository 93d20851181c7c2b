#!/bin/bash
# Copy each ensemble sweep's compact summary (sweep.json: config + per-member
# best-epoch metrics) into the tracked runs_evidence/ tree so headline-table
# evidence survives workspace resets (runs/ itself is gitignored and was
# wiped once mid-round-3 by a reset).
set -u
cd /root/repo
for f in runs/r3/*/sweep.json; do
  name=$(basename "$(dirname "$f")")
  mkdir -p runs_evidence/r3
  cp "$f" "runs_evidence/r3/$name.sweep.json"
done
ls runs_evidence/r3/ | wc -l
