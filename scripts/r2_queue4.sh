#!/bin/bash
# Round-2 queue 4: CVS on the authors' pickles with the annealed aux schedule
# (460->46) — the one untested cell of the optimizer/config matrix. Probes
# whether annealing combines mult-460 peak quality with mult-46 seed
# stability on the reference data.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r2

for seed in 12 13 14; do
  name=cvs_ref_anneal_s$seed
  echo "=== cvs ref annealed 460->46 seed $seed ==="
  python -m structured_latent_odes_tpu.training_cvs --num-epochs 1000 \
    --reference-data-dir /root/reference/data/cvs --seed $seed \
    --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 500 \
    --eval-every 4 --no-eval-train --no-plot \
    --results-root "runs/r2/$name" > "runs/r2/$name.log" 2>&1
  python -m structured_latent_odes_tpu.eval cvs "runs/r2/$name/results_Mechanistic" --json \
    | tee "runs/r2/$name.eval.json"
done

echo "ALL R2 QUEUE4 DONE"
