#!/bin/bash
# Round-4 queue 2 — prior_lr_mult probe at the FINAL headline recipes
# (VERDICT r3 next-#5). The prior-lag collapse mechanism was diagnosed in
# round 2 and the knob built (train/svi.py::make_dual_optimizer,
# prior_lr_mult scales the conditional-prior nets' Adam step), but no
# round-3 queue tested it at the 5000-epoch CVS headline or the challenge
# recipe. One fresh seed set per value; compare against the mult=1
# ledgers (RESULTS.md). Either the CVS per-seed both-anchor rate moves
# materially or the knob is documented a dead end.
set -e
cd "$(dirname "$0")/.."
OUT=runs/r4
mkdir -p $OUT

sweep () {
  ds=$1; name=$2; seeds=$3; shift 3
  echo "=== $name ($ds seeds $seeds) $(date +%H:%M) ==="
  python -u -m structured_latent_odes_tpu.sweep "$ds" --seeds "$seeds" \
    --results-root $OUT/$name "$@" 2>&1 | tail -4
}

# CVS headline recipe + prior_lr_mult (fresh decades; 12..131 all used)
for m in 2 5; do
  case $m in 2) seeds=132..141;; 5) seeds=142..151;; esac
  sweep cvs cvs_priorlr${m} $seeds --reference-data-dir /root/reference/data/cvs \
    --num-epochs 5000 --aux-loss-multiplier 460 \
    --aux-mult-start 46 --aux-warmup-epochs 1500 \
    --lr-final 5e-5 --lr-decay-start 2000 \
    --prior-lr-mult $m
done

# Challenge headline recipe + prior_lr_mult (fresh octades; 12..59 used)
for m in 2 5; do
  case $m in 2) seeds=60..67;; 5) seeds=68..75;; esac
  sweep challenge chal_priorlr${m} $seeds --split 5 --data-seed 12 \
    --num-epochs 3000 --mini-batch-size 8 \
    --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
    --lr-final 1e-4 --lr-decay-start 2000 \
    --prior-lr-mult $m
done

for n in cvs_priorlr2 cvs_priorlr5 chal_priorlr2 chal_priorlr5; do
  [ -e "runs/r4/$n/sweep.json" ] && mkdir -p runs_evidence/r4 \
    && cp "runs/r4/$n/sweep.json" "runs_evidence/r4/$n.sweep.json"
done
echo "R4 QUEUE2 DONE $(date +%H:%M)"
