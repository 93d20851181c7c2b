#!/bin/bash
# Round-2 quality experiments on one TPU chip (sequential queue — keep the
# chip lease warm; each run exits cleanly before the next starts).
#
# The decisive question (VERDICT r1 weak #2): does the Pyro-parity SHARED
# Adam fix the labeled-block collapse at the reference's default
# aux_loss_multiplier=46?  Matrix: {46,460} x {shared,split} on CVS, plus
# reference-pickle CVS, proc split 1 (flat + annealed), challenge fold-5
# annealed, and the quantile_diff=0.25 CVS variant.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r2

run_cvs () {  # name extra-args...
  local name=$1; shift
  echo "=== cvs/$name: $* ==="
  python -m structured_latent_odes_tpu.training_cvs --num-epochs 1000 \
    --eval-every 4 --no-eval-train --no-plot --results-root "runs/r2/$name" "$@" \
    > "runs/r2/$name.log" 2>&1
  python -m structured_latent_odes_tpu.eval cvs "runs/r2/$name/results_Mechanistic" --json \
    | tee "runs/r2/$name.eval.json"
}

run_cvs cvs46_shared  --aux-loss-multiplier 46  --optimizer shared
run_cvs cvs46_split   --aux-loss-multiplier 46  --optimizer split
run_cvs cvs460_shared --aux-loss-multiplier 460 --optimizer shared
run_cvs cvs460_ref    --aux-loss-multiplier 460 --optimizer shared \
  --reference-data-dir /root/reference/data/cvs
run_cvs cvs46_ref     --aux-loss-multiplier 46  --optimizer shared \
  --reference-data-dir /root/reference/data/cvs
run_cvs cvs460_q25    --aux-loss-multiplier 460 --optimizer shared --quantile-diff 0.25

echo "=== proc split1 flat 460 shared ==="
python -m structured_latent_odes_tpu.training_proc --num-epochs 2500 \
  --aux-loss-multiplier 460 --eval-every 4 --no-eval-train --no-plot \
  --results-root runs/r2/proc460_shared > runs/r2/proc460_shared.log 2>&1
python -m structured_latent_odes_tpu.eval proc runs/r2/proc460_shared/results_Mechanistic --json \
  | tee runs/r2/proc460_shared.eval.json

echo "=== proc split1 annealed 460->46 shared ==="
python -m structured_latent_odes_tpu.training_proc --num-epochs 2500 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1250 \
  --eval-every 4 --no-eval-train --no-plot \
  --results-root runs/r2/proc_anneal_shared > runs/r2/proc_anneal_shared.log 2>&1
python -m structured_latent_odes_tpu.eval proc runs/r2/proc_anneal_shared/results_Mechanistic --json \
  | tee runs/r2/proc_anneal_shared.eval.json

echo "=== proc split1 default 46 shared (reference config) ==="
python -m structured_latent_odes_tpu.training_proc --num-epochs 2500 \
  --eval-every 4 --no-eval-train --no-plot \
  --results-root runs/r2/proc46_shared > runs/r2/proc46_shared.log 2>&1
python -m structured_latent_odes_tpu.eval proc runs/r2/proc46_shared/results_Mechanistic --json \
  | tee runs/r2/proc46_shared.eval.json

echo "=== challenge fold5 annealed shared ==="
python -m structured_latent_odes_tpu.training_challenge --split 5 --num-epochs 2000 \
  --mini-batch-size 8 --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1000 \
  --eval-every 4 --no-eval-train --no-plot \
  --results-root runs/r2/chal5_anneal_shared > runs/r2/chal5_anneal_shared.log 2>&1
python -m structured_latent_odes_tpu.eval challenge runs/r2/chal5_anneal_shared/results_Mechanistic --json \
  | tee runs/r2/chal5_anneal_shared.eval.json

echo "=== challenge fold5 default 46 shared (reference config) ==="
python -m structured_latent_odes_tpu.training_challenge --split 5 --num-epochs 500 \
  --eval-every 4 --no-eval-train --no-plot \
  --results-root runs/r2/chal5_46_shared > runs/r2/chal5_46_shared.log 2>&1
python -m structured_latent_odes_tpu.eval challenge runs/r2/chal5_46_shared/results_Mechanistic --json \
  | tee runs/r2/chal5_46_shared.eval.json

echo "ALL R2 EXPERIMENTS DONE"
