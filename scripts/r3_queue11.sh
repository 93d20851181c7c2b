#!/bin/bash
# Round-3 queue 11: convert the two CVS plateau seeds (s13/s16 stall early
# under the warm1500 headline). Four probes with existing knobs:
#   (a) more horizon          — 5000 ep, same ramp/decay knobs
#   (b) lower base lr         — 5e-4 (plateau as lr-instability hypothesis)
#   (c) faster prior tracking — prior_lr_mult 3 (prior-lag hypothesis)
#   (d) later lr decay        — decay@3000 (early decay locks the plateau in)
set -u
cd /root/repo
OUT=runs/r3
mkdir -p $OUT
REF=/root/reference/data/cvs

sweep () {
  name=$1; shift 1
  echo "=== cvs $name"
  python -u -m structured_latent_odes_tpu.sweep cvs --seeds 12..21 \
    --results-root $OUT/$name --reference-data-dir $REF \
    --aux-loss-multiplier 460 --aux-mult-start 46 --aux-warmup-epochs 1500 \
    "$@" > $OUT/$name.log 2>&1
  tail -3 $OUT/$name.log
}

sweep cvs_warm1500_5000ep --num-epochs 5000 --lr-final 5e-5 --lr-decay-start 2000
sweep cvs_warm1500_lr5e4  --num-epochs 4000 --learning-rate 5e-4 \
  --lr-final 5e-5 --lr-decay-start 2000
sweep cvs_warm1500_priorlr3 --num-epochs 4000 --prior-lr-mult 3 \
  --lr-final 5e-5 --lr-decay-start 2000
sweep cvs_warm1500_decay3000 --num-epochs 4000 \
  --lr-final 5e-5 --lr-decay-start 3000

echo "QUEUE11 DONE"
