#!/bin/bash
# Round-5 queue 5 (= queue 39) — CVS confirmation decade for the averaged
# deployment, through sweep.py's first-class deployments path.
#
# PRE-REGISTERED (committed before training): the deployed predictor is the
# VETO-MEAN (as in queue 37); pass = sweep.json deployments.veto_mean beats
# both published CVS anchors (0.520 / 0.522). Seeds untouched: 182..191.
set -e -o pipefail
cd "$(dirname "$0")/.."
mkdir -p runs/r5 runs_evidence/r5

echo "=== cvs_avg_blind2 (cvs seeds 182..191) $(date +%H:%M) ==="
python -u -m structured_latent_odes_tpu.sweep cvs --seeds 182..191 \
  --results-root runs/r5/cvs_avg_blind2 --evidence-dir runs_evidence/r5 \
  --reference-data-dir /root/reference/data/cvs \
  --num-epochs 5000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 1500 \
  --lr-final 5e-5 --lr-decay-start 2000 2>&1 | tail -6

echo "R5 QUEUE5 DONE $(date +%H:%M)"
