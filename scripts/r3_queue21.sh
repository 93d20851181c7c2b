#!/bin/bash
# Queue 21: complete the Gauss ablation at the FINAL proc headline recipe
# (split 1, horizon 4000 — queue 9 ran Gauss-proc at the old default
# horizon 2500). Two 5-seed halves per the axon device-abort footprint.
set -e
cd "$(dirname "$0")/.."
OUT=runs/r3
mkdir -p $OUT
for half in "a 12..16" "b 17..21"; do
  set -- $half
  echo "=== gauss_proc_h4000_$1 (seeds $2) $(date +%H:%M)"
  python -u -m structured_latent_odes_tpu.sweep proc --seeds "$2" \
    --model MechanisticGauss --split 1 --num-epochs 4000 \
    --results-root $OUT/gauss_proc_h4000_$1 | tail -8
done
echo "QUEUE21 DONE"
