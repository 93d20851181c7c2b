#!/bin/bash
# Round-3 queue 13: the queue-11 lesson (best_epoch at the horizon == the
# run was truncated, not converged) applied to the other workloads:
#  - proc split-1 best epochs cluster at 2200-2501/2501 → try 4000 ep
#  - heldout h22 best epochs sit at EXACTLY 2501 (the max) at 10/10 seeds
#  - challenge lrdecay headline best epochs 2500-2989 of 3000 → try 4000 ep
#    (keep the 1500 ramp fixed — queue 6 showed the RAMP must not stretch)
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

sweep proc proc_4000ep 12..21 --split 1 --num-epochs 4000

sweep proc heldout_4000ep_a 12..16 --heldout R33S34_Y81C76 --num-epochs 4000
sweep proc heldout_4000ep_b 17..21 --heldout R33S34_Y81C76 --num-epochs 4000

sweep challenge chal_lrdecay_4000ep 12..19 --split 5 --data-seed 12 \
  --num-epochs 4000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
  --lr-final 1e-4 --lr-decay-start 2500

echo "QUEUE13 DONE"
