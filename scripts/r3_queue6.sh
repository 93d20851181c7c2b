#!/bin/bash
# Round-3 queue 6: (a) does the ramp-length trend saturate? (b) do the new
# headline recipes hold on a FRESH seed decade (22..31 / 20..27 — seeds
# never used for recipe selection)?
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

# (a) saturation probes
sweep cvs cvs460_warm2000_5000_lrdecay 12..21 --reference-data-dir $REF \
  --num-epochs 5000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 2000 \
  --lr-final 5e-5 --lr-decay-start 2500
sweep challenge chal5_ds12_anneal2000_4000 12..19 --split 5 --data-seed 12 \
  --num-epochs 4000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 2000

# (b) headline recipes on fresh seed decades
sweep cvs cvs_headline_fresh_seeds 22..31 --reference-data-dir $REF \
  --num-epochs 4000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 1500 \
  --lr-final 5e-5 --lr-decay-start 2000
sweep challenge chal_headline_fresh_seeds 20..27 --split 5 --data-seed 12 \
  --num-epochs 3000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500

echo "QUEUE6 DONE"
