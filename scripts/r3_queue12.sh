#!/bin/bash
# Round-3 queue 12: fresh-seed-decade validation of the queue-11 CVS winner
# (warm1500, 5000 epochs, lr decay @2000 — 10/10 both-anchor on s12..21).
set -u
cd /root/repo
OUT=runs/r3
mkdir -p $OUT

echo "=== cvs cvs_5000ep_fresh (22..31)"
python -u -m structured_latent_odes_tpu.sweep cvs --seeds 22..31 \
  --results-root $OUT/cvs_5000ep_fresh \
  --reference-data-dir /root/reference/data/cvs \
  --num-epochs 5000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 1500 \
  --lr-final 5e-5 --lr-decay-start 2000 > $OUT/cvs_5000ep_fresh.log 2>&1
tail -3 $OUT/cvs_5000ep_fresh.log

echo "QUEUE12 DONE"
