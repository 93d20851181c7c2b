#!/bin/bash
# Round-3 queue 1c: CVS — warm-up + late lr decay (the convergence lever the
# reference's constant-1e-3 Adam lacks). Goal: pull the warm-up recipe's
# posterior under the anchors at most seeds while keeping its no-collapse
# prior.
set -u
cd /root/repo
REF=/root/reference/data/cvs
OUT=runs/r3
mkdir -p $OUT

sweep () {
  name=$1; shift
  echo "=== cvs $name ==="
  python -u -m structured_latent_odes_tpu.sweep cvs --seeds 12..21 \
    --reference-data-dir $REF \
    --results-root $OUT/$name "$@" > $OUT/$name.log 2>&1
  tail -3 $OUT/$name.log
}

sweep cvs460_warm500_2000_lrdecay --num-epochs 2000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 500 \
  --lr-final 1e-4 --lr-decay-start 1000
sweep cvs460_2000_lrdecay --num-epochs 2000 --aux-loss-multiplier 460 \
  --lr-final 1e-4 --lr-decay-start 1000
sweep cvs460_warm500_3000_lrdecay --num-epochs 3000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 500 \
  --lr-final 5e-5 --lr-decay-start 1500

echo "QUEUE1C DONE"
