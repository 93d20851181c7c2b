#!/bin/bash
# Round-3 queue 3: proc (split 1 + heldout h22) seed-robustness sweeps, and
# the MechanisticGauss ablation re-runs under round-2 semantics (VERDICT r2
# missing #1: the round-1 Gauss numbers used the superseded split Adam).
set -u
cd /root/repo
OUT=runs/r3
mkdir -p $OUT

sweep () {
  ds=$1; name=$2; shift 2
  echo "=== $ds $name ==="
  python -u -m structured_latent_odes_tpu.sweep $ds --seeds $SEEDS \
    --results-root $OUT/$name "$@" > $OUT/$name.log 2>&1
  tail -3 $OUT/$name.log
}

# proc fold 1, reference default config (beats post anchor at all r2 seeds)
SEEDS=12..21 sweep proc proc46 --split 1
# the prior-reliable annealed recipe
SEEDS=12..17 sweep proc proc_anneal --split 1 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1250
# heldout zero-shot, default config (beats anchor by ~49% in r2)
SEEDS=12..21 sweep proc heldout46 --heldout R33S34_Y81C76

# Gauss ablations at each dataset's headline recipe (shared Adam semantics)
SEEDS=12..14 sweep cvs gauss_cvs460 --model MechanisticGauss \
  --num-epochs 1000 --aux-loss-multiplier 460 \
  --reference-data-dir /root/reference/data/cvs
SEEDS=12..14 sweep proc gauss_proc46 --model MechanisticGauss --split 1
SEEDS=12..14 sweep challenge gauss_chal5_anneal --model MechanisticGauss \
  --split 5 --num-epochs 2000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1000

echo "QUEUE3 DONE"
