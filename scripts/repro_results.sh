#!/bin/bash
# Reproduce RESULTS.md quality numbers on one TPU chip (sequential; ~3 h).
set -e
cd "$(dirname "$0")/.."

run_eval () {  # dataset results_root
  python -m structured_latent_odes_tpu.eval "$1" "$2/results_Mechanistic" --figures
}

# CVS — reference configuration (aux multiplier 46) and disentangling 460
python -m structured_latent_odes_tpu.training_cvs --num-epochs 1000 --no-eval-train --results-root runs/cvs
run_eval cvs runs/cvs
python -m structured_latent_odes_tpu.training_cvs --num-epochs 1000 --aux-loss-multiplier 460 --no-eval-train --results-root runs/cvs460
run_eval cvs runs/cvs460

# Challenge fold 5 (the BASELINE.md anchor fold)
python -m structured_latent_odes_tpu.training_challenge --num-epochs 500 --no-eval-train --results-root runs/challenge
run_eval challenge runs/challenge
# the recipe that beats both anchors: strong-then-annealed aux pressure
python -m structured_latent_odes_tpu.training_challenge --split 5 --num-epochs 2000 \
  --mini-batch-size 8 --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1000 \
  --eval-every 4 --no-eval-train --results-root runs/challenge_anneal
run_eval challenge runs/challenge_anneal

# Synbio split 1 (anchor) and the h22 zero-shot heldout device
python -m structured_latent_odes_tpu.training_proc --num-epochs 2500 --no-eval-train --results-root runs/proc
run_eval proc runs/proc
python -m structured_latent_odes_tpu.training_proc --num-epochs 2500 --heldout R33S34_Y81C76 --no-eval-train --results-root runs/proc_heldout
run_eval proc-heldout runs/proc_heldout
