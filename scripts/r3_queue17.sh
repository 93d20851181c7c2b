#!/bin/bash
# Queue 17: close the challenge posterior-anchor tail (15/16 -> 16/16?).
#
# The one miss across both decades is fresh s20 at 41.31 post (queue 10).
# Hypotheses, probed on the SELECTION decade s12..19 ONLY (fresh decades
# stay clean for validation):
#   (a) horizon starvation: best_epoch clusters near the 3000 cap at several
#       seeds (e.g. 2808, 2973) — stretch to 4000 epochs, decay from 2500.
#   (b) gradient variance: 2-particle ELBO cut the CVS tail (queue 8) —
#       try it at the exact headline recipe.
# A winner (median AND worst-seed improvement over headline 34.86/36.40)
# gets validated on a brand-new decade s28..35.
set -e
cd "$(dirname "$0")/.."
OUT=runs/r3
mkdir -p $OUT

sweep () {  # name seeds extra...
  name=$1; seeds=$2; shift 2
  echo "=== challenge $name ($seeds) $(date -u +%H:%M)"
  python -u -m structured_latent_odes_tpu.sweep challenge --seeds "$seeds" \
    --results-root $OUT/$name --split 5 --data-seed 12 \
    --mini-batch-size 8 \
    --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
    "$@" 2>&1 | grep -v "^WARNING" | tail -11
}

# (a) horizon 4000, decay shifted to 2500
sweep chal_h4000 12..19 --num-epochs 4000 --lr-final 1e-4 --lr-decay-start 2500

# (b) 2-particle at the exact headline recipe
sweep chal_2p 12..19 --num-epochs 3000 --lr-final 1e-4 --lr-decay-start 2000 \
  --num-particles 2

echo "QUEUE17 DONE"
