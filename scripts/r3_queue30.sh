#!/bin/bash
# Queue 30: does Gauss's challenge prior advantage (queue 24: 36.50 vs
# quantile 37.57 on selection seeds) hold on fresh seeds 28..43 (where
# quantile posts 36.35/39.04)? Completes the "Gauss if prior matters"
# guidance with out-of-selection evidence.
set -e
cd "$(dirname "$0")/.."
OUT=runs/r3
mkdir -p $OUT
for oct in "c 28..35" "d 36..43"; do
  set -- $oct
  echo "=== gauss_chal_fresh_$1 (seeds $2) $(date +%H:%M)"
  python -u -m structured_latent_odes_tpu.sweep challenge --seeds "$2" \
    --model MechanisticGauss --split 5 --data-seed 12 \
    --num-epochs 3000 --mini-batch-size 8 \
    --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
    --lr-final 1e-4 --lr-decay-start 2000 \
    --results-root $OUT/gauss_chal_fresh_$1 | tail -3
done
echo "QUEUE30 DONE"
