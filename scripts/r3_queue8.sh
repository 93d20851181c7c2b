#!/bin/bash
# Round-3 queue 8: combine the proven winners.
# (a) CVS warm1500 + 2-particle ELBO: 2-particle bought median at warm500
#     but reopened the collapse tail; does the stronger warm1500 ramp keep
#     the tail closed?  (b) challenge anneal1500/3000 + late lr decay: the
#     two individually-best levers composed.
set -u
cd /root/repo
OUT=runs/r3
mkdir -p $OUT

sweep () {
  ds=$1; name=$2; seeds=$3; shift 3
  echo "=== $ds $name ($seeds)"
  python -u -m structured_latent_odes_tpu.sweep $ds --seeds $seeds \
    --results-root $OUT/$name "$@" > $OUT/$name.log 2>&1
  tail -3 $OUT/$name.log
}

REF=/root/reference/data/cvs

sweep cvs cvs_warm1500_2particle 12..21 --reference-data-dir $REF \
  --num-epochs 4000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 1500 \
  --lr-final 5e-5 --lr-decay-start 2000 --num-particles 2

sweep challenge chal_anneal1500_lrdecay 12..19 --split 5 --data-seed 12 \
  --num-epochs 3000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
  --lr-final 1e-4 --lr-decay-start 2000

echo "QUEUE8 DONE"
