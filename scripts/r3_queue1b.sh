#!/bin/bash
# Round-3 queue 1b: CVS warm-up refinements. queue1 found aux warm-up
# (46 -> 460 over 500 ep) eliminates prior collapse at 10/10 seeds; these
# close the remaining posterior gap (best_epoch hugging the 1000-ep cap says
# the runs were still improving).
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

# PRIOR-REFIT: flat-460's posterior (the best) + a 200-epoch prior-only
# refit of the selected model — targets the lag mechanism directly
sweep cvs460_refit200 --num-epochs 1000 --aux-loss-multiplier 460 \
  --prior-refit-epochs 200
sweep cvs460_warm500_2000ep --num-epochs 2000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 500
sweep cvs460_warm500_refit200 --num-epochs 1000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 500 --prior-refit-epochs 200

echo "QUEUE1B DONE"
