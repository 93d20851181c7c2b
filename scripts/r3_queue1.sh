#!/bin/bash
# Round-3 queue 1: CVS on the authors' pickles — anti-collapse recipe matrix.
# Each line is a 10-seed ensemble sweep (S full runs in one jit, eval-every-1
# selection by construction). Goal (VERDICT r2 item 2): one recipe with
# post/prior <= 0.525/0.527 at >=4/5 seeds.
set -u
cd /root/repo
REF=/root/reference/data/cvs
SEEDS=12..21
OUT=runs/r3
mkdir -p $OUT

sweep () {
  name=$1; shift
  echo "=== cvs $name ==="
  python -u -m structured_latent_odes_tpu.sweep cvs --seeds $SEEDS \
    --num-epochs 1000 --reference-data-dir $REF \
    --results-root $OUT/$name "$@" > $OUT/$name.log 2>&1
  tail -3 $OUT/$name.log
}

sweep cvs460           --aux-loss-multiplier 460
sweep cvs460_plm10     --aux-loss-multiplier 460 --prior-lr-mult 10
sweep cvs460_plm3      --aux-loss-multiplier 460 --prior-lr-mult 3
sweep cvs460_warm500   --aux-loss-multiplier 460 --aux-mult-start 46 --aux-warmup-epochs 500
sweep cvs46_plm10      --prior-lr-mult 10
sweep cvs460_plm10_warm --aux-loss-multiplier 460 --prior-lr-mult 10 --aux-mult-start 46 --aux-warmup-epochs 500

echo "QUEUE1 DONE"
