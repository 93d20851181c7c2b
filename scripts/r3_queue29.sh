#!/bin/bash
# Queue 29: CVS headline at 100 total seeds — five more decades (62..111)
# on top of queue 25's 50, for a definitive large-N characterization.
set -e
cd "$(dirname "$0")/.."
OUT=runs/r3
mkdir -p $OUT
for dec in "f 62..71" "g 72..81" "h 82..91" "i 92..101" "j 102..111"; do
  set -- $dec
  echo "=== cvs_headline_fresh_$1 (seeds $2) $(date +%H:%M)"
  python -u -m structured_latent_odes_tpu.sweep cvs --seeds "$2" \
    --reference-data-dir /root/reference/data/cvs \
    --num-epochs 5000 --aux-loss-multiplier 460 \
    --aux-mult-start 46 --aux-warmup-epochs 1500 \
    --lr-final 5e-5 --lr-decay-start 2000 \
    --results-root $OUT/cvs_headline_fresh_$1 | tail -3
done
echo "QUEUE29 DONE"
