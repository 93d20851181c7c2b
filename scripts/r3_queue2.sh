#!/bin/bash
# Round-3 queue 2: challenge fold 5 — anti-collapse recipe matrix.
# Goal (VERDICT r2 item 2): post <= 38.620 AND prior <= 40 at 3/3 seeds
# (12,13,14); we sweep 6 seeds per recipe since the ensemble makes it free.
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

# reference default config (500 ep, full batch) with faster prior tracking
sweep chal5_default_plm10  --prior-lr-mult 10
sweep chal5_default_plm3   --prior-lr-mult 3
# round-2's best recipes, with and without the prior-lr knob
sweep chal5_anneal1000        --num-epochs 2000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1000
sweep chal5_anneal1000_plm10  --num-epochs 2000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1000 \
  --prior-lr-mult 10
sweep chal5_anneal1500_plm10  --num-epochs 2000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
  --prior-lr-mult 10
# aux WARM-UP recipes (the round-3 CVS finding: ramping the aux scale up
# lets the conditional prior track from the start — no prior collapse at
# any of 10 CVS seeds)
sweep chal5_default_warm100 --aux-mult-start 0 --aux-warmup-epochs 100
sweep chal5_warm500 --num-epochs 2000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-start 46 --aux-warmup-epochs 500
# PRIOR-REFIT recipes: train as usual, then 200 prior-only epochs on the
# selected model (posterior untouched)
sweep chal5_default_refit200 --prior-refit-epochs 200
sweep chal5_anneal1000_refit200 --num-epochs 2000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1000 \
  --prior-refit-epochs 200

echo "QUEUE2 DONE"
