#!/bin/bash
# Round-3 queue 2b: challenge fold 5 — lr decay + multi-particle ELBO on top
# of the annealed recipe (variance reduction for the 28-subject fold).
set -u
cd /root/repo
OUT=runs/r3
mkdir -p $OUT

sweep () {
  name=$1; shift
  echo "=== challenge $name ==="
  python -u -m structured_latent_odes_tpu.sweep challenge --seeds 12..17 \
    --split 5 --results-root $OUT/$name "$@" > $OUT/$name.log 2>&1
  tail -3 $OUT/$name.log
}

sweep chal5_anneal1000_lrdecay --num-epochs 2000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1000 \
  --lr-final 1e-4 --lr-decay-start 1000
sweep chal5_anneal1000_np4 --num-epochs 2000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1000 \
  --num-particles 4
sweep chal5_anneal1000_lrdecay_np4 --num-epochs 2000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1000 \
  --lr-final 1e-4 --lr-decay-start 1000 --num-particles 4

echo "QUEUE2B DONE"
