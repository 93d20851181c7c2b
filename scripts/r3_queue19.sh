#!/bin/bash
# Queue 19: re-run queue 15 (full cross-validation tables) — the original
# outputs were wiped by the mid-round workspace reset before the summaries
# were preserved or written up. Every challenge fold and proc split gets an
# ensemble sweep at the FINAL headline recipe (proc now at the headline
# horizon 4000, which queue 15 predated; proc decades run as 5+5 halves
# for the axon device-abort footprint).
set -u
cd "$(dirname "$0")/.."
OUT=runs/r3
mkdir -p $OUT

sweep () {  # dataset name seeds extra...
  ds=$1; name=$2; seeds=$3; shift 3
  echo "=== $ds $name ($seeds) $(date -u +%H:%M)"
  python -u -m structured_latent_odes_tpu.sweep $ds --seeds "$seeds" \
    --results-root $OUT/$name "$@" 2>&1 | grep -v "^WARNING" | tail -12
}

# Challenge folds 1-4 (fold 5 = the headline, queues 8+10) at the headline
# lr-decay recipe, fold membership pinned by --data-seed 12.
for f in 1 2 3 4; do
  sweep challenge chal_cv_fold$f 12..19 --split $f --data-seed 12 \
    --num-epochs 3000 --mini-batch-size 8 \
    --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
    --lr-final 1e-4 --lr-decay-start 2000
done

# Proc splits 2-4 (split 1 = the headline, queues 14+18) at the reference
# default recipe, headline horizon 4000.
for s in 2 3 4; do
  sweep proc proc_cv_split${s}_a 12..16 --split $s --num-epochs 4000
  sweep proc proc_cv_split${s}_b 17..21 --split $s --num-epochs 4000
done

echo "QUEUE19 DONE"
