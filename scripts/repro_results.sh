#!/bin/bash
# Reproduce RESULTS.md round-2 headline numbers on one TPU chip (sequential).
# All runs use the shared per-parameter Adam (Pyro parity, the default).
set -e
cd "$(dirname "$0")/.."

run_eval () {  # dataset results_root extra...
  python -m structured_latent_odes_tpu.eval "$1" "$2/results_Mechanistic" --figures "${@:3}"
}

# ---- CVS ------------------------------------------------------------------
# Reference configuration (aux multiplier 46): full disentanglement,
# prior ~ post (PARITY.md "RESOLVED").
python -m structured_latent_odes_tpu.training_cvs --num-epochs 1000 \
  --no-eval-train --results-root runs/cvs46
run_eval cvs runs/cvs46 --gt datasets/cvs/cvs.npz

# The anchor-beating run on the upstream authors' own pickles:
# class-averaged L1 post/prior 0.427/0.451 vs published 0.520/0.522.
# (Guarded: only this run needs the external reference checkout.)
if [ -d /root/reference/data/cvs ]; then
  python -m structured_latent_odes_tpu.training_cvs --num-epochs 1000 \
    --aux-loss-multiplier 460 --reference-data-dir /root/reference/data/cvs \
    --no-eval-train --results-root runs/cvs460_ref
  run_eval cvs runs/cvs460_ref
else
  echo "skipping cvs460_ref: /root/reference/data/cvs not present"
fi

# ---- Challenge -------------------------------------------------------------
# Fold 5 annealed recipes (anchors 38.62/38.97): anneal over 1000 maximizes
# posterior quality (35.47); anneal over 1500 beats BOTH anchors at once
# (38.23/37.53).
python -m structured_latent_odes_tpu.training_challenge --split 5 --num-epochs 2000 \
  --mini-batch-size 8 --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1000 \
  --eval-every 4 --no-eval-train --results-root runs/challenge_anneal
run_eval challenge runs/challenge_anneal
python -m structured_latent_odes_tpu.training_challenge --split 5 --num-epochs 2000 \
  --mini-batch-size 8 --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
  --eval-every 4 --no-eval-train --results-root runs/challenge_anneal1500
run_eval challenge runs/challenge_anneal1500
# Reference configuration (500 epochs, full batch).
python -m structured_latent_odes_tpu.training_challenge --split 5 --num-epochs 500 \
  --no-eval-train --results-root runs/challenge46
run_eval challenge runs/challenge46

# ---- Synbio (proc) ----------------------------------------------------------
# Split 1, the reference's UNMODIFIED default configuration (mult 46):
# post 4.03 / prior 15.85 vs anchors 6.02/16.52 — both beaten.
python -m structured_latent_odes_tpu.training_proc --num-epochs 2500 \
  --eval-every 4 --no-eval-train --results-root runs/proc46
run_eval proc runs/proc46
# Annealed alternative (slightly better prior, better label accuracy):
# post 5.16 / prior 15.54.
python -m structured_latent_odes_tpu.training_proc --num-epochs 2500 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1250 \
  --eval-every 4 --no-eval-train --results-root runs/proc_anneal
run_eval proc runs/proc_anneal
# Zero-shot heldout device h22 at the UNMODIFIED default configuration:
# L1 3.03 vs anchor 5.874 (48% better; per-condition 6.06 vs 11.747).
python -m structured_latent_odes_tpu.training_proc --num-epochs 2500 \
  --heldout R33S34_Y81C76 \
  --eval-every 4 --no-eval-train --results-root runs/proc_heldout
run_eval proc-heldout runs/proc_heldout
