#!/bin/bash
# Queue 24: challenge Gauss at the EXACT final headline recipe — queue 9's
# challenge Gauss predates the late lr-decay addition (queue 10).
set -e
cd "$(dirname "$0")/.."
OUT=runs/r3
mkdir -p $OUT
echo "=== gauss_chal_lrdecay (seeds 12..19) $(date +%H:%M)"
python -u -m structured_latent_odes_tpu.sweep challenge --seeds 12..19 \
  --model MechanisticGauss --split 5 --data-seed 12 \
  --num-epochs 3000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
  --lr-final 1e-4 --lr-decay-start 2000 \
  --results-root $OUT/gauss_chal_lrdecay | tail -11
echo "QUEUE24 DONE"
