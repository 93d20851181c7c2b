#!/bin/bash
# Reproduce RESULTS.md round-3 headline numbers on one TPU chip.
# All quality tables come from ENSEMBLE SWEEPS (S seeds in one jitted
# dispatch, every-epoch best-model selection — the reference's cadence).
# A 10-seed CVS sweep ≈ minutes; the whole file ≈ 1-2 h on a v5e chip.
#
# Determinism note: re-running a sweep with the SAME member count per
# dispatch reproduces bit-exactly (queue 17 replicated queue 14's challenge
# probe to the digit). Changing the member count (e.g. 10 in one dispatch
# vs the 5+5 halves some tables used) shifts the auto-backend width hint
# and hence compilation, perturbing medians by ~1% (proc 3.71 vs 3.68).
set -e
cd "$(dirname "$0")/.."
OUT=runs/repro
mkdir -p $OUT

sweep () {  # dataset name seeds extra...
  ds=$1; name=$2; seeds=$3; shift 3
  python -u -m structured_latent_odes_tpu.sweep "$ds" --seeds "$seeds" \
    --results-root $OUT/$name "$@" | tail -3
}

# ---- CVS (authors' own pickles; anchors post 0.520 / prior 0.522) ----------
# HEADLINE: aux warm-up 46→460 over 1500, 5000 epochs, late lr decay →
# medians 0.430/0.429, 10/10 selection seeds under BOTH anchors (worst
# 0.504/0.514), fresh decade 0.430/0.448 (RESULTS.md queues 11+12).
if [ -d /root/reference/data/cvs ]; then
  sweep cvs cvs_headline 12..21 --reference-data-dir /root/reference/data/cvs \
    --num-epochs 5000 --aux-loss-multiplier 460 \
    --aux-mult-start 46 --aux-warmup-epochs 1500 \
    --lr-final 5e-5 --lr-decay-start 2000
else
  echo "skipping cvs_headline: /root/reference/data/cvs not present"
fi

# ---- Challenge (fold 5; anchors post 38.620 / prior 38.969) ----------------
# HEADLINE: fold PINNED to the published split (--data-seed 12), annealed aux
# 460→46 over 1500 at 3000 epochs + late lr decay → medians 34.86/37.57
# (fresh decade 36.21/37.82); 15/16 seeds across both decades beat the
# posterior anchor (RESULTS.md queue 8+10).
sweep challenge chal_headline 12..19 --split 5 --data-seed 12 \
  --num-epochs 3000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
  --lr-final 1e-4 --lr-decay-start 2000

# ---- Synbio proc (split 1; anchors post 6.019 / prior 16.524) --------------
# HEADLINE: the reference's default config, horizon stretched 2500→4000
# (queue 14: converged by 4000, selection spread 1721..3973) → median 3.68,
# 10/10 seeds beat the posterior anchor by >=21%.
sweep proc proc_headline 12..21 --split 1 --num-epochs 4000

# Zero-shot heldout device h22 (anchors L1 5.874 / per-condition 11.747):
# horizon 4000 (queue 16 shows 6000 is 0.09 WORSE — converged); run as two
# 5-seed halves to stay under the axon device-abort footprint.
sweep proc heldout_a 12..16 --heldout R33S34_Y81C76 --num-epochs 4000
sweep proc heldout_b 17..21 --heldout R33S34_Y81C76 --num-epochs 4000

# ---- Gauss-likelihood ablation (full decades at the exact headline recipes;
#      RESULTS.md queue-9 table: statistically tied, quantile ahead by hairs)
if [ -d /root/reference/data/cvs ]; then
  sweep cvs gauss_cvs 12..21 --model MechanisticGauss \
    --reference-data-dir /root/reference/data/cvs \
    --num-epochs 5000 --aux-loss-multiplier 460 \
    --aux-mult-start 46 --aux-warmup-epochs 1500 \
    --lr-final 5e-5 --lr-decay-start 2000
fi
sweep proc gauss_proc 12..21 --model MechanisticGauss --split 1 --num-epochs 4000
sweep challenge gauss_chal 12..19 --model MechanisticGauss \
  --split 5 --data-seed 12 \
  --num-epochs 3000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
  --lr-final 1e-4 --lr-decay-start 2000

# ---- Sequential single-run CLI (artifact dump + notebook-equivalent eval) --
# The sweep members above replicate this path bit-for-bit at each seed
# (tests/test_ensemble.py); one sequential run regenerates the .npy artifact
# tree + figures for inspection:
python -m structured_latent_odes_tpu.training_cvs --num-epochs 1000 \
  --no-eval-train --results-root $OUT/cvs46_sequential
python -m structured_latent_odes_tpu.eval cvs \
  $OUT/cvs46_sequential/results_Mechanistic --figures --gt datasets/cvs/cvs.npz
