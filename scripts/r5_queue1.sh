#!/bin/bash
# Round-5 queue 1 — BLIND validation of the PRIOR-VETO selection rule
# (select_member veto margin 0.05 + rank-combine, committed a7c53ee BEFORE
# any of these seeds was trained; margin tuned ONLY on runs_evidence/r4
# archives + the queue-34 arms) + the tail-EMA mechanism decade (ask #5).
#
# Part A (queue-32 protocol): one brand-new untouched seed set per workload
# at the final headline recipes; selection decided inside sweep.py with no
# human in the loop. Pass = selected member beats every published anchor.
# Proc runs at 8 seeds — parity with the other workloads — contingent on
# the 10x4000 chunked-dispatch repro (runs/r5/proc_10x4000_repro) having
# completed, which retires the RECIPES <=5-member caveat.
#
# Part B: fresh CVS decade at the final recipe with tail-phase EMA
# (decay 0.99 from lr_decay_start): per-seed paired EMA-vs-snapshot test
# metrics land in members[i].ema for the fragility-mechanism verdict.
#
# Evidence lands transactionally per sweep via --evidence-dir (sweep.py
# writes the copy the moment each sweep completes — VERDICT r4 ask #6).
set -e -o pipefail
cd "$(dirname "$0")/.."
OUT=runs/r5
EV=runs_evidence/r5
mkdir -p $OUT $EV

sweep () {
  ds=$1; name=$2; seeds=$3; shift 3
  echo "=== $name ($ds seeds $seeds) $(date +%H:%M) ==="
  python -u -m structured_latent_odes_tpu.sweep "$ds" --seeds "$seeds" \
    --results-root $OUT/$name --evidence-dir $EV "$@" 2>&1 | tail -5
}

# --- Part A: blind veto-selection validation on untouched seeds ----------

# CVS: next untouched decade (r4 campaign used up to 151)
sweep cvs cvs_blind3_sel 152..161 --reference-data-dir /root/reference/data/cvs \
  --num-epochs 5000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 1500 \
  --lr-final 5e-5 --lr-decay-start 2000

# Challenge fold 5: seeds beyond the queue-34 range (76..83)
sweep challenge chal_blind3_sel 90..97 --split 5 --data-seed 12 \
  --num-epochs 3000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
  --lr-final 1e-4 --lr-decay-start 2000

# Proc split 1 + heldout h22: seeds beyond the r4 blind range (47..51),
# at 8 members (the 10x4000 repro shows chunked dispatch handles it)
sweep proc proc_blind3_sel 55..62 --split 1 --num-epochs 4000
sweep proc heldout_blind3_sel 55..62 --heldout R33S34_Y81C76 --num-epochs 4000

# --- Part B: tail-EMA mechanism decade (CVS fragility, ask #5) -----------
sweep cvs cvs_ema_decade 162..171 --reference-data-dir /root/reference/data/cvs \
  --num-epochs 5000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 1500 \
  --lr-final 5e-5 --lr-decay-start 2000 \
  --tail-ema 0.99

echo "R5 QUEUE1 DONE $(date +%H:%M)"
