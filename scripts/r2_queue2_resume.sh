#!/bin/bash
# Resume tail of r2_queue2.sh (session crash killed these two).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r2

name=cvs_ref_460_np2_s13
echo "=== cvs ref $name (resume) ==="
python -m structured_latent_odes_tpu.training_cvs --num-epochs 1000 \
  --reference-data-dir /root/reference/data/cvs \
  --seed 13 --aux-loss-multiplier 460 --num-particles 2 \
  --eval-every 4 --no-eval-train --no-plot \
  --results-root "runs/r2/$name" > "runs/r2/$name.log" 2>&1
python -m structured_latent_odes_tpu.eval cvs "runs/r2/$name/results_Mechanistic" --json \
  | tee "runs/r2/$name.eval.json"

echo "=== cvs460 self-generated + ground-truth exact recovery ==="
python -m structured_latent_odes_tpu.training_cvs --num-epochs 1000 \
  --aux-loss-multiplier 460 --data-path datasets/cvs/ \
  --eval-every 4 --no-eval-train --no-plot \
  --results-root runs/r2/cvs460_gt > runs/r2/cvs460_gt.log 2>&1
python -m structured_latent_odes_tpu.eval cvs runs/r2/cvs460_gt/results_Mechanistic \
  --gt datasets/cvs/cvs.npz --json | tee runs/r2/cvs460_gt.eval.json

echo "ALL R2 QUEUE2-RESUME DONE"
