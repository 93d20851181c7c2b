#!/bin/bash
# Round-3 queue 5: push the two headline recipes further.
# - CVS: the queue4 control showed ramp LENGTH is the anti-plateau lever
#   (warm1000 converted 7/10 seeds past epoch 2800). Test an even slower
#   ramp with a longer run for the remaining plateau seeds (16/17/19).
# - Challenge (fold pinned to the published split): the anneal1000 recipe
#   sits at 5/8 both-anchor seeds; test a slower anneal + more epochs and
#   the lr-decay composition at the 3000-epoch horizon.
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

# 1) CVS slower-still ramp, longer run
sweep cvs cvs460_warm1500_4000_lrdecay 12..21 --reference-data-dir $REF \
  --num-epochs 4000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 1500 \
  --lr-final 5e-5 --lr-decay-start 2000

# 2) challenge pinned fold: slower anneal at 3000 epochs
sweep challenge chal5_ds12_anneal1500_3000 12..19 --split 5 --data-seed 12 \
  --num-epochs 3000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500

# 3) challenge pinned fold: headline anneal + late lr decay at 3000 epochs
sweep challenge chal5_ds12_anneal1000_3000_lrdecay 12..19 --split 5 --data-seed 12 \
  --num-epochs 3000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1000 \
  --lr-final 1e-4 --lr-decay-start 2000

echo "QUEUE5 DONE"
