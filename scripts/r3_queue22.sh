#!/bin/bash
# Queue 22: Gauss ablation on the zero-shot heldout device h22 at the final
# headline recipe (horizon 4000) — the last workload variant without an
# ablation data point. Two 5-seed halves per the axon device-abort footprint.
set -e
cd "$(dirname "$0")/.."
OUT=runs/r3
mkdir -p $OUT
for half in "a 12..16" "b 17..21"; do
  set -- $half
  echo "=== gauss_heldout_h4000_$1 (seeds $2) $(date +%H:%M)"
  python -u -m structured_latent_odes_tpu.sweep proc --seeds "$2" \
    --model MechanisticGauss --heldout R33S34_Y81C76 --num-epochs 4000 \
    --results-root $OUT/gauss_heldout_h4000_$1 | tail -8
done
echo "QUEUE22 DONE"
