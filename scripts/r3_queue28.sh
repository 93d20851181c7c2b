#!/bin/bash
# Queue 28: challenge anneal FLOOR probe at the lrdecay recipe, controlled
# on the queue-26 seeds (28..43; baseline floor 46 = post med 36.35 /
# prior med 39.04, post-anchor 13/16, both 7/16). Late aux pressure is the
# one dial plausibly pushing the large-N prior median over its anchor.
set -e
cd "$(dirname "$0")/.."
OUT=runs/r3
mkdir -p $OUT
for floor in 20 100; do
  for oct in "c 28..35" "d 36..43"; do
    set -- $oct
    echo "=== chal_floor${floor}_$1 (seeds $2) $(date +%H:%M)"
    python -u -m structured_latent_odes_tpu.sweep challenge --seeds "$2" \
      --split 5 --data-seed 12 --num-epochs 3000 --mini-batch-size 8 \
      --aux-loss-multiplier 460 --aux-mult-final $floor --aux-anneal-epochs 1500 \
      --lr-final 1e-4 --lr-decay-start 2000 \
      --results-root $OUT/chal_floor${floor}_$1 | tail -3
  done
done
echo "QUEUE28 DONE"
