#!/bin/bash
# Queue 23: CVS Gauss ablation at the EXACT final headline recipe
# (queue 9 ran it at the then-headline 4000 epochs; the final CVS headline
# is 5000 epochs — queues 11+12). Authors' pickles, 10 seeds.
set -e
cd "$(dirname "$0")/.."
OUT=runs/r3
mkdir -p $OUT
echo "=== gauss_cvs_5000ep (seeds 12..21) $(date +%H:%M)"
python -u -m structured_latent_odes_tpu.sweep cvs --seeds 12..21 \
  --model MechanisticGauss --reference-data-dir /root/reference/data/cvs \
  --num-epochs 5000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 1500 \
  --lr-final 5e-5 --lr-decay-start 2000 \
  --results-root $OUT/gauss_cvs_5000ep | tail -13
echo "QUEUE23 DONE"
