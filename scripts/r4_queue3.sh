#!/bin/bash
# Round-4 queue 3 — confirm or retire the queue-33 challenge prior_lr_mult=5
# hint (prior median 37.07 vs anchor 38.969 at n=8 on seeds 68..75).
# PAIRED design on one fresh octade (76..83, never used anywhere): mult=5 vs
# the headline mult=1 recipe on the SAME seeds, so the comparison is
# per-seed-matched rather than cross-octade (challenge seed spread is ±5 L1).
set -e -o pipefail
cd "$(dirname "$0")/.."
OUT=runs/r4
mkdir -p $OUT

sweep () {
  name=$1; shift 1
  echo "=== $name $(date +%H:%M) ==="
  python -u -m structured_latent_odes_tpu.sweep challenge --seeds 76..83 \
    --results-root $OUT/$name --split 5 --data-seed 12 \
    --num-epochs 3000 --mini-batch-size 8 \
    --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
    --lr-final 1e-4 --lr-decay-start 2000 "$@" 2>&1 | tail -4
}

sweep chal_priorlr5_confirm --prior-lr-mult 5
sweep chal_priorlr1_control

for n in chal_priorlr5_confirm chal_priorlr1_control; do
  if [ ! -e "runs/r4/$n/sweep.json" ]; then
    echo "FATAL: runs/r4/$n/sweep.json missing" >&2; exit 1
  fi
  mkdir -p runs_evidence/r4
  cp "runs/r4/$n/sweep.json" "runs_evidence/r4/$n.sweep.json"
done
echo "R4 QUEUE3 DONE $(date +%H:%M)"
