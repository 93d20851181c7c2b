#!/bin/bash
# Round-3 queue 15: FULL cross-validation tables. The reference's published
# evidence is one fold per dataset (challenge fold 5, proc split 1); here
# every fold/split gets an 8-seed ensemble sweep at the headline recipe.
set -u
cd /root/repo
OUT=runs/r3
mkdir -p $OUT

sweep () {
  ds=$1; name=$2; seeds=$3; shift 3
  echo "=== $ds $name ($seeds) $(date +%H:%M)"
  python -u -m structured_latent_odes_tpu.sweep $ds --seeds $seeds \
    --results-root $OUT/$name "$@" > $OUT/$name.log 2>&1
  tail -3 $OUT/$name.log
}

# Challenge folds 1-4 (fold 5 = the headline, already done) at the headline
# recipe, fold membership pinned by --data-seed 12 (the published split).
for f in 1 2 3 4; do
  sweep challenge chal_cv_fold$f 12..19 --split $f --data-seed 12 \
    --num-epochs 3000 --mini-batch-size 8 \
    --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
    --lr-final 1e-4 --lr-decay-start 2000
done

# Proc splits 2-4 (split 1 = the headline) at the reference default.
for s in 2 3 4; do
  sweep proc proc_cv_split$s 12..21 --split $s
done

echo "QUEUE15 DONE"
