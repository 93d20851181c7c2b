#!/bin/bash
# Round-3 queue 16: heldout h22 is STILL horizon-starved at 4000 epochs
# (queue 14: best_epoch == 4001 at 10/10 seeds, post median 3.029 and
# falling) -> probe 6000 epochs, split into 5+5 halves to stay under the
# axon footprint that triggered the earlier device error.
set -u
cd /root/repo
OUT=runs/r3
mkdir -p $OUT

sweep () {
  ds=$1; name=$2; seeds=$3; shift 3
  echo "=== $ds $name ($seeds) $(date +%H:%M)"
  python -u -m structured_latent_odes_tpu.sweep $ds --seeds $seeds \
    --results-root $OUT/$name "$@" > $OUT/$name.log 2>&1
  tail -3 $OUT/$name.log
}

sweep proc heldout_6000ep_a 12..16 --heldout R33S34_Y81C76 --num-epochs 6000
sweep proc heldout_6000ep_b 17..21 --heldout R33S34_Y81C76 --num-epochs 6000

echo "QUEUE16 DONE"
