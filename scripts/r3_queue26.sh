#!/bin/bash
# Queue 26: large-sample validation for the proc and challenge headlines
# (same exercise as queue 25's CVS 50-seed check). Proc halves of 5 per the
# axon device-abort footprint.
set -e
cd "$(dirname "$0")/.."
OUT=runs/r3
mkdir -p $OUT
for spec in "proc_h4000_fresh_c 32..36 --split 1" \
            "proc_h4000_fresh_d 37..41 --split 1" \
            "heldout_h4000_fresh_c 32..36 --heldout R33S34_Y81C76" \
            "heldout_h4000_fresh_d 37..41 --heldout R33S34_Y81C76"; do
  set -- $spec
  name=$1; seeds=$2; shift 2
  echo "=== proc $name ($seeds) $(date +%H:%M)"
  python -u -m structured_latent_odes_tpu.sweep proc --seeds "$seeds" "$@" \
    --num-epochs 4000 --results-root $OUT/$name | tail -3
done
for spec in "chal_lrdecay_fresh_c 28..35" "chal_lrdecay_fresh_d 36..43"; do
  set -- $spec
  echo "=== challenge $1 ($2) $(date +%H:%M)"
  python -u -m structured_latent_odes_tpu.sweep challenge --seeds "$2" \
    --split 5 --data-seed 12 --num-epochs 3000 --mini-batch-size 8 \
    --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
    --lr-final 1e-4 --lr-decay-start 2000 \
    --results-root $OUT/$1 | tail -3
done
echo "QUEUE26 DONE"
