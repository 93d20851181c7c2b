#!/bin/bash
# Round-3 queue 9: MechanisticGauss ablation at the FINAL headline recipes,
# full seed decades (the round-3 Gauss table used 3 seeds at older recipes).
# Quantile comparisons already exist: cvs_warm1500 (s12..21),
# chal_anneal1500 (s12..19), proc46 (s12..21).
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

sweep cvs gauss_cvs_headline 12..21 --model MechanisticGauss \
  --reference-data-dir $REF \
  --num-epochs 4000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 1500 \
  --lr-final 5e-5 --lr-decay-start 2000

sweep challenge gauss_chal_headline 12..19 --model MechanisticGauss \
  --split 5 --data-seed 12 \
  --num-epochs 3000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500

sweep proc gauss_proc_headline 12..21 --model MechanisticGauss

echo "QUEUE9 DONE"
