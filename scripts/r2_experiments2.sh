#!/bin/bash
# Round-2 follow-on queue: waits for r2_experiments.sh to drain, then runs
# bench validation, the per-dispatch latency probe, zero-shot heldout,
# challenge folds 1-4 (annealed), and a CVS seed-variance check.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r2

while pgrep -f "r2_experiments.sh" | grep -qv $$; do sleep 60; done
sleep 30

echo "=== bench.py (validates new scale/MFU sections on chip) ==="
python bench.py | tee runs/r2/bench_r2.json

echo "=== per-dispatch latency probe ==="
python - <<'EOF' 2>&1 | tee runs/r2/latency_probe.txt
import time
import jax, jax.numpy as jnp

# raw dispatch floor: a trivial jitted op, chained, blocked once
x = jnp.ones(4)
f = jax.jit(lambda x: x + 1)
f(x).block_until_ready()
t0 = time.perf_counter()
y = x
for _ in range(200):
    y = f(y)
y.block_until_ready()
per = (time.perf_counter() - t0) / 200
print(f"raw chained dispatch: {per*1e6:.0f} us/op -> ceiling {1/per:.0f} ops/s")

# same but blocking every step (interactive pattern)
t0 = time.perf_counter()
for _ in range(100):
    f(x).block_until_ready()
per = (time.perf_counter() - t0) / 100
print(f"raw blocking dispatch: {per*1e6:.0f} us/op -> ceiling {1/per:.0f} ops/s")
EOF

echo "=== proc heldout h22 zero-shot (shared) ==="
python -m structured_latent_odes_tpu.training_proc --num-epochs 2500 \
  --aux-loss-multiplier 460 --heldout R33S34_Y81C76 \
  --eval-every 4 --no-eval-train --no-plot \
  --results-root runs/r2/proc_heldout_shared > runs/r2/proc_heldout_shared.log 2>&1
python -m structured_latent_odes_tpu.eval proc-heldout runs/r2/proc_heldout_shared/results_Mechanistic --json \
  | tee runs/r2/proc_heldout_shared.eval.json

for fold in 1 2 3 4; do
  echo "=== challenge fold $fold annealed shared ==="
  python -m structured_latent_odes_tpu.training_challenge --split $fold --num-epochs 2000 \
    --mini-batch-size 8 --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1000 \
    --eval-every 4 --no-eval-train --no-plot \
    --results-root runs/r2/chal${fold}_anneal_shared > runs/r2/chal${fold}_anneal_shared.log 2>&1
  python -m structured_latent_odes_tpu.eval challenge runs/r2/chal${fold}_anneal_shared/results_Mechanistic --json \
    | tee runs/r2/chal${fold}_anneal_shared.eval.json
done

for seed in 13 14; do
  echo "=== cvs460_ref seed $seed (variance check) ==="
  python -m structured_latent_odes_tpu.training_cvs --num-epochs 1000 \
    --aux-loss-multiplier 460 --seed $seed --reference-data-dir /root/reference/data/cvs \
    --eval-every 4 --no-eval-train --no-plot \
    --results-root runs/r2/cvs460_ref_s$seed > runs/r2/cvs460_ref_s$seed.log 2>&1
  python -m structured_latent_odes_tpu.eval cvs runs/r2/cvs460_ref_s$seed/results_Mechanistic --json \
    | tee runs/r2/cvs460_ref_s$seed.eval.json
done

echo "ALL R2 FOLLOW-ON DONE"
