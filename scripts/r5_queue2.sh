#!/bin/bash
# Round-5 queue 2 — CROSS-FOLD generality of the veto'd selection rule.
#
# Queues 31/32/34/35 validated best-of-ensemble selection only on the
# reference's published folds (challenge fold 5, proc split 1). This queue
# runs one fresh 8-seed ensemble per remaining challenge fold (1-4) and proc
# split (2-4) at the final headline recipes and lets the committed veto rule
# pick blind.
#
# PRE-REGISTERED pass criterion (committed before any of these seeds was
# trained; no published anchors exist off the anchor folds): the selected
# member must beat ITS OWN fold/split's queue-19 full-decade median on BOTH
# post and prior L1 (RESULTS.md queue 19 tables — seeds 12..19 / 12..21,
# same recipes). That is selection's core claim: it converts the per-seed
# distribution into a better-than-median deployment, on folds it was never
# tuned on.
#
#   challenge fold medians (post/prior): 1: 36.40/44.99  2: 31.61/32.75
#                                        3: 41.69/39.02  4: 38.39/43.93
#   proc split medians   (post/prior): 2: 3.87/15.73  3: 3.27/15.71
#                                      4: 3.93/15.60
#
# Seeds are brand-new and untouched: challenge 100..107, proc 70..77.
set -e -o pipefail
cd "$(dirname "$0")/.."
OUT=runs/r5
EV=runs_evidence/r5
mkdir -p $OUT $EV

sweep () {
  ds=$1; name=$2; seeds=$3; shift 3
  echo "=== $name ($ds seeds $seeds) $(date +%H:%M) ==="
  python -u -m structured_latent_odes_tpu.sweep "$ds" --seeds "$seeds" \
    --results-root $OUT/$name --evidence-dir $EV "$@" 2>&1 | tail -4
}

for fold in 1 2 3 4; do
  sweep challenge chal_cv_sel_fold$fold 100..107 --split $fold --data-seed 12 \
    --num-epochs 3000 --mini-batch-size 8 \
    --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
    --lr-final 1e-4 --lr-decay-start 2000
done

for split in 2 3 4; do
  sweep proc proc_cv_sel_split$split 70..77 --split $split --num-epochs 4000
done

echo "R5 QUEUE2 DONE $(date +%H:%M)"
