#!/bin/bash
# Round-3 queue 10: fresh-seed-decade validation of the queue-8 challenge
# winner (anneal1500 + late lr decay) — seeds 20..27, disjoint from the
# s12..19 selection sweep. If post med stays under the anneal1500
# fresh-decade result (37.23) it takes the challenge headline.
set -u
cd /root/repo
OUT=runs/r3
mkdir -p $OUT

echo "=== challenge chal_lrdecay_fresh (20..27)"
python -u -m structured_latent_odes_tpu.sweep challenge --seeds 20..27 \
  --results-root $OUT/chal_lrdecay_fresh --split 5 --data-seed 12 \
  --num-epochs 3000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
  --lr-final 1e-4 --lr-decay-start 2000 > $OUT/chal_lrdecay_fresh.log 2>&1
tail -3 $OUT/chal_lrdecay_fresh.log

echo "QUEUE10 DONE"
