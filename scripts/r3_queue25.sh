#!/bin/bash
# Queue 25: mass fresh-seed validation of the CVS headline recipe (warm-up
# 46->460/1500, 5000 ep, lr->5e-5@2000) — three more decades (seeds 32..61)
# on top of selection 12..21 and fresh 22..31, for 50 seeds total.
set -e
cd "$(dirname "$0")/.."
OUT=runs/r3
mkdir -p $OUT
for dec in "c 32..41" "d 42..51" "e 52..61"; do
  set -- $dec
  echo "=== cvs_headline_fresh_$1 (seeds $2) $(date +%H:%M)"
  python -u -m structured_latent_odes_tpu.sweep cvs --seeds "$2" \
    --reference-data-dir /root/reference/data/cvs \
    --num-epochs 5000 --aux-loss-multiplier 460 \
    --aux-mult-start 46 --aux-warmup-epochs 1500 \
    --lr-final 5e-5 --lr-decay-start 2000 \
    --results-root $OUT/cvs_headline_fresh_$1 | tail -3
done
echo "QUEUE25 DONE"
