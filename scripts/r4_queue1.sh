#!/bin/bash
# Round-4 queue 1 — BLIND validation of the PRIOR-AWARE selection rule
# (select_member rank-combine, committed in 4846d56 BEFORE these seeds were
# ever trained) + the queue-30 re-run whose round-3 evidence was lost.
#
# Part A (queue 32 protocol): one brand-new fresh seed set per workload at
# the final headline recipes; the committed rule (criterion + selection-split
# prior-L1 rank-combine + converged-epoch guard) decides 'selected' inside
# sweep.py with no human in the loop.  Pass = selected member beats every
# published anchor, per workload — including the proc prior (16.524,
# /root/reference/sbio_eval_folds_final.ipynb cell 5) that the round-3
# criterion-only rule missed blind.
#
# Part B re-runs queue 30 (Gauss challenge prior advantage on fresh seeds;
# scripts/r3_queue30.sh completed after round-3's last commit and its outputs
# were lost — VERDICT.md missing #2).
set -e
cd "$(dirname "$0")/.."
OUT=runs/r4
mkdir -p $OUT

sweep () {
  ds=$1; name=$2; seeds=$3; shift 3
  echo "=== $name ($ds seeds $seeds) $(date +%H:%M) ==="
  python -u -m structured_latent_odes_tpu.sweep "$ds" --seeds "$seeds" \
    --results-root $OUT/$name "$@" 2>&1 | tail -5
}

# --- Part A: blind selection validation on untouched seeds ---------------

# CVS: next untouched decade (r3 campaign used 12..111, blind used 112..121)
sweep cvs cvs_blind2_sel 122..131 --reference-data-dir /root/reference/data/cvs \
  --num-epochs 5000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 1500 \
  --lr-final 5e-5 --lr-decay-start 2000

# Challenge fold 5: seeds beyond the r3 blind range (44..51)
sweep challenge chal_blind2_sel 52..59 --split 5 --data-seed 12 \
  --num-epochs 3000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
  --lr-final 1e-4 --lr-decay-start 2000

# Proc split 1 + heldout h22: seeds beyond the r3 blind range (42..46)
sweep proc proc_blind2_sel 47..51 --split 1 --num-epochs 4000
sweep proc heldout_blind2_sel 47..51 --heldout R33S34_Y81C76 --num-epochs 4000

# --- Part B: queue-30 re-run (Gauss challenge prior, fresh seeds) --------
for oct in "c 28..35" "d 36..43"; do
  set -- $oct
  sweep challenge gauss_chal_fresh_$1 "$2" \
    --model MechanisticGauss --split 5 --data-seed 12 \
    --num-epochs 3000 --mini-batch-size 8 \
    --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
    --lr-final 1e-4 --lr-decay-start 2000
done

for f in runs/r4/*/sweep.json; do
  [ -e "$f" ] || continue
  mkdir -p runs_evidence/r4
  cp "$f" "runs_evidence/r4/$(basename "$(dirname "$f")").sweep.json"
done
echo "R4 QUEUE1 DONE $(date +%H:%M)"
