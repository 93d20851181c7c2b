#!/bin/bash
# Round-5 queue 4 (= queue 38) — confirmation octade for the averaged
# deployment on the workload where selection is most fragile (challenge),
# ALSO the first live run of sweep.py's first-class deployments
# (deploy_mean / deploy_veto_mean, commit 4c74bc5).
#
# PRE-REGISTERED (committed before training): the deployed predictor is the
# PLAIN MEAN (as in queue 37); pass = beats both published fold-5 anchors
# (38.620 / 38.969). sweep.json's deployments.mean is the record — no
# separate report step, no human choice. Seeds untouched: 120..127.
set -e -o pipefail
cd "$(dirname "$0")/.."
mkdir -p runs/r5 runs_evidence/r5

echo "=== chal_avg_blind2 (challenge seeds 120..127) $(date +%H:%M) ==="
python -u -m structured_latent_odes_tpu.sweep challenge --seeds 120..127 \
  --results-root runs/r5/chal_avg_blind2 --evidence-dir runs_evidence/r5 \
  --split 5 --data-seed 12 \
  --num-epochs 3000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
  --lr-final 1e-4 --lr-decay-start 2000 2>&1 | tail -6

echo "R5 QUEUE4 DONE $(date +%H:%M)"
