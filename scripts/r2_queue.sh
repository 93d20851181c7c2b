#!/bin/bash
# Round-2 session queue (sequential, one TPU chip): regenerates the runs/
# artifacts wiped with the environment and fills the remaining RESULTS.md
# gaps — proc/challenge under the shared Adam, zero-shot heldout, challenge
# folds 1-4 annealed, and a CVS seed-variance check.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r2

ev () {  # dataset dir name
  python -m structured_latent_odes_tpu.eval "$1" "runs/r2/$2/results_Mechanistic" --json \
    | tee "runs/r2/$2.eval.json"
}

echo "=== proc split1 annealed 460->46 shared ==="
python -m structured_latent_odes_tpu.training_proc --num-epochs 2500 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1250 \
  --eval-every 4 --no-eval-train --no-plot \
  --results-root runs/r2/proc_anneal_shared > runs/r2/proc_anneal_shared.log 2>&1
ev proc proc_anneal_shared

echo "=== challenge fold5 annealed shared ==="
python -m structured_latent_odes_tpu.training_challenge --split 5 --num-epochs 2000 \
  --mini-batch-size 8 --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1000 \
  --eval-every 4 --no-eval-train --no-plot \
  --results-root runs/r2/chal5_anneal_shared > runs/r2/chal5_anneal_shared.log 2>&1
ev challenge chal5_anneal_shared

echo "=== challenge fold5 default 46 shared (reference config) ==="
python -m structured_latent_odes_tpu.training_challenge --split 5 --num-epochs 500 \
  --eval-every 4 --no-eval-train --no-plot \
  --results-root runs/r2/chal5_46_shared > runs/r2/chal5_46_shared.log 2>&1
ev challenge chal5_46_shared

echo "=== proc split1 default 46 shared (reference config) ==="
python -m structured_latent_odes_tpu.training_proc --num-epochs 2500 \
  --eval-every 4 --no-eval-train --no-plot \
  --results-root runs/r2/proc46_shared > runs/r2/proc46_shared.log 2>&1
ev proc proc46_shared

echo "=== proc heldout h22 zero-shot (shared) ==="
python -m structured_latent_odes_tpu.training_proc --num-epochs 2500 \
  --aux-loss-multiplier 460 --heldout R33S34_Y81C76 \
  --eval-every 4 --no-eval-train --no-plot \
  --results-root runs/r2/proc_heldout_shared > runs/r2/proc_heldout_shared.log 2>&1
ev proc-heldout proc_heldout_shared

for fold in 1 2 3 4; do
  echo "=== challenge fold $fold annealed shared ==="
  python -m structured_latent_odes_tpu.training_challenge --split $fold --num-epochs 2000 \
    --mini-batch-size 8 --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1000 \
    --eval-every 4 --no-eval-train --no-plot \
    --results-root runs/r2/chal${fold}_anneal_shared > runs/r2/chal${fold}_anneal_shared.log 2>&1
  ev challenge chal${fold}_anneal_shared
done

for seed in 13 14; do
  echo "=== cvs460_ref seed $seed (variance check) ==="
  python -m structured_latent_odes_tpu.training_cvs --num-epochs 1000 \
    --aux-loss-multiplier 460 --seed $seed --reference-data-dir /root/reference/data/cvs \
    --eval-every 4 --no-eval-train --no-plot \
    --results-root runs/r2/cvs460_ref_s$seed > runs/r2/cvs460_ref_s$seed.log 2>&1
  ev cvs cvs460_ref_s$seed
done

echo "ALL R2 QUEUE DONE"
