#!/bin/bash
# Round-3 queue 4 (post-chain): heldout retry in two halves (the 10-seed
# sweep died twice with a device-level "TPU device error"; halving the
# member count halves live-buffer footprint and isolates whether the fault
# is size-dependent), the TPU half of the long-horizon bench, and a CVS
# refinement matrix around the warm500+lrdecay winner.
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

# 1) heldout zero-shot, split 5+5
sweep proc heldout46_a 12..16 --heldout R33S34_Y81C76
sweep proc heldout46_b 17..21 --heldout R33S34_Y81C76

# 2) long-horizon single-chip numbers (VERDICT r2 #8)
python -u scripts/bench_longhorizon.py --tpu > $OUT/longhorizon_tpu.json 2>&1
tail -2 $OUT/longhorizon_tpu.json

# 3) CVS refinements (authors' pickles) around warm500_3000_lrdecay
REF=/root/reference/data/cvs
sweep cvs cvs460_warm1000_3000_lrdecay 12..21 --reference-data-dir $REF \
  --num-epochs 3000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 1000 \
  --lr-final 5e-5 --lr-decay-start 1500
sweep cvs cvs460_warm500_4000_lrdecay 12..21 --reference-data-dir $REF \
  --num-epochs 4000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 500 \
  --lr-final 2e-5 --lr-decay-start 2000
sweep cvs cvs460_warm500_3000_lrdecay_np2 12..21 --reference-data-dir $REF \
  --num-epochs 3000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 500 \
  --lr-final 5e-5 --lr-decay-start 1500 --num-particles 2

echo "QUEUE4 DONE"
