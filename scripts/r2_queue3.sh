#!/bin/bash
# Round-2 queue 3: seed replication for the headline single-seed claims.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r2

# Challenge fold 5, the both-anchor recipe (2000 ep, batch 8, 460->46 over
# 1500) was single-seed (s12: post 38.23 / prior 37.53). Two more seeds.
for seed in 13 14; do
  name=chal5_anneal_long_s$seed
  echo "=== challenge fold5 anneal-1500 seed $seed ==="
  python -m structured_latent_odes_tpu.training_challenge --split 5 --num-epochs 2000 \
    --mini-batch-size 8 --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
    --seed $seed --eval-every 4 --no-eval-train --no-plot \
    --results-root "runs/r2/$name" > "runs/r2/$name.log" 2>&1
  python -m structured_latent_odes_tpu.eval challenge "runs/r2/$name/results_Mechanistic" --json \
    | tee "runs/r2/$name.eval.json"
done

# Proc split-1 default config (beats both anchors at s12) was single-seed.
for seed in 13 14; do
  name=proc46_shared_s$seed
  echo "=== proc default 46 shared seed $seed ==="
  python -m structured_latent_odes_tpu.training_proc --num-epochs 2500 \
    --seed $seed --eval-every 4 --no-eval-train --no-plot \
    --results-root "runs/r2/$name" > "runs/r2/$name.log" 2>&1
  python -m structured_latent_odes_tpu.eval proc "runs/r2/$name/results_Mechanistic" --json \
    | tee "runs/r2/$name.eval.json"
done

# CVS on authors' pickles, mult 460: one more seed for the spread table.
name=cvs460_ref_s15
echo "=== cvs ref 460 seed 15 ==="
python -m structured_latent_odes_tpu.training_cvs --num-epochs 1000 \
  --reference-data-dir /root/reference/data/cvs --seed 15 --aux-loss-multiplier 460 \
  --eval-every 4 --no-eval-train --no-plot \
  --results-root "runs/r2/$name" > "runs/r2/$name.log" 2>&1
python -m structured_latent_odes_tpu.eval cvs "runs/r2/$name/results_Mechanistic" --json \
  | tee "runs/r2/$name.eval.json"

echo "ALL R2 QUEUE3 DONE"
