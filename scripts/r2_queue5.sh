#!/bin/bash
# Round-2 queue 5: last replication probes — the challenge anneal-1000
# recipe at the unlucky seed 14, and a second seed of the heldout h22
# zero-shot default-config win.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r2

name=chal5_anneal_s14
echo "=== challenge fold5 anneal-1000 seed 14 ==="
python -m structured_latent_odes_tpu.training_challenge --split 5 --num-epochs 2000 \
  --mini-batch-size 8 --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1000 \
  --seed 14 --eval-every 4 --no-eval-train --no-plot \
  --results-root "runs/r2/$name" > "runs/r2/$name.log" 2>&1
python -m structured_latent_odes_tpu.eval challenge "runs/r2/$name/results_Mechanistic" --json \
  | tee "runs/r2/$name.eval.json"

name=proc_heldout_46_s13
echo "=== proc heldout default 46 seed 13 ==="
python -m structured_latent_odes_tpu.training_proc --num-epochs 2500 \
  --seed 13 --heldout R33S34_Y81C76 --eval-every 4 --no-eval-train --no-plot \
  --results-root "runs/r2/$name" > "runs/r2/$name.log" 2>&1
python -m structured_latent_odes_tpu.eval proc-heldout "runs/r2/$name/results_Mechanistic" --json \
  | tee "runs/r2/$name.eval.json"

echo "ALL R2 QUEUE5 DONE"
