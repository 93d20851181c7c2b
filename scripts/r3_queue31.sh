#!/bin/bash
# Queue 31 — BLIND validation of best-of-ensemble selection (select_member,
# committed in 13b2033 BEFORE these seeds were ever trained).  One brand-new
# fresh seed set per workload at the final headline recipes; the committed
# selection rule (criterion argmin + converged-epoch guard) decides the
# 'selected' member inside sweep.py with no human in the loop.  Pass =
# selected member beats every published anchor, per workload.
set -e
cd "$(dirname "$0")/.."
OUT=runs/r3
mkdir -p $OUT

sweep () {
  ds=$1; name=$2; seeds=$3; shift 3
  echo "=== $name ($ds seeds $seeds) ==="
  python -u -m structured_latent_odes_tpu.sweep "$ds" --seeds "$seeds" \
    --results-root $OUT/$name "$@" 2>&1 | tail -4
}

# CVS: first completely untouched decade after the 100-seed campaign
sweep cvs cvs_blind_sel 112..121 --reference-data-dir /root/reference/data/cvs \
  --num-epochs 5000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 1500 \
  --lr-final 5e-5 --lr-decay-start 2000

# Challenge fold 5: seeds beyond the queue-26/28 range (44..51)
sweep challenge chal_blind_sel 44..51 --split 5 --data-seed 12 \
  --num-epochs 3000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
  --lr-final 1e-4 --lr-decay-start 2000

# Proc split 1 + heldout h22: seeds beyond the queue-26 range (42..46)
sweep proc proc_blind_sel 42..46 --split 1 --num-epochs 4000
sweep proc heldout_blind_sel 42..46 --heldout R33S34_Y81C76 --num-epochs 4000

bash scripts/preserve_evidence.sh
