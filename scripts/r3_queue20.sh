#!/bin/bash
# Queue 20: challenge aux-PULSE probe — the one untried schedule shape.
# CVS's anti-collapse winner ramps aux UP (46->460: keeps each class's
# posterior constellation tight while pressure grows); challenge's winner
# ramps DOWN (460->46: rescues the prior). The sequential composition
# (driver.epoch_aux_mult) can do both in one run: 46 -> 460 over the
# warm-up, then 460 -> 46 over the anneal ("pulse"). If early dispersion
# hurts challenge the way it hurts CVS, the pulse should cut the worst
# seeds without costing the prior. Selection decade s12..19 only; a winner
# (median < 34.86 AND worst < 38.10) gets fresh validation on s20..27.
set -u
cd "$(dirname "$0")/.."
OUT=runs/r3
mkdir -p $OUT

sweep () {  # name extra...
  name=$1; shift
  echo "=== challenge $name (12..19) $(date -u +%H:%M)"
  python -u -m structured_latent_odes_tpu.sweep challenge --seeds 12..19 \
    --results-root $OUT/$name --split 5 --data-seed 12 \
    --num-epochs 3000 --mini-batch-size 8 \
    --aux-loss-multiplier 460 --aux-mult-final 46 \
    --lr-final 1e-4 --lr-decay-start 2000 \
    "$@" 2>&1 | grep -v "^WARNING" | tail -11
}

# (a) peak at 500: 46->460/500, then 460->46/1500 (back to 46 by ep 2000)
sweep chal_pulse500 --aux-mult-start 46 --aux-warmup-epochs 500 \
  --aux-anneal-epochs 1500

# (b) peak at 1000: slower ramp, same descent end (46 by ep 2500)
sweep chal_pulse1000 --aux-mult-start 46 --aux-warmup-epochs 1000 \
  --aux-anneal-epochs 1500

echo "QUEUE20 DONE"
