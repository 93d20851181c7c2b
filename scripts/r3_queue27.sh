#!/bin/bash
# Queue 27: CVS warm-up length at the 5000-epoch horizon. Queue 2's
# "warm2000 regresses" finding predates the 5000-ep horizon (queues 11+12);
# with 5000 epochs the high-pressure phase is no longer starved. Controlled
# on the exact queue-25 seeds (32..61, baseline warm1500 = 17/30
# both-anchor, post med 0.470 / prior med 0.476).
set -e
cd "$(dirname "$0")/.."
OUT=runs/r3
mkdir -p $OUT
for warm in 2000 2500; do
  for dec in "c 32..41" "d 42..51" "e 52..61"; do
    set -- $dec
    echo "=== cvs_warm${warm}_5000ep_$1 (seeds $2) $(date +%H:%M)"
    python -u -m structured_latent_odes_tpu.sweep cvs --seeds "$2" \
      --reference-data-dir /root/reference/data/cvs \
      --num-epochs 5000 --aux-loss-multiplier 460 \
      --aux-mult-start 46 --aux-warmup-epochs $warm \
      --lr-final 5e-5 --lr-decay-start 2000 \
      --results-root $OUT/cvs_warm${warm}_5000ep_$1 | tail -3
  done
done
echo "QUEUE27 DONE"
