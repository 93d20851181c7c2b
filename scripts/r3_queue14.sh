#!/bin/bash
# Round-3 queue 14: the queue-13 work stranded by the tunnel outage
# (proc/heldout/challenge horizon probes), with the proc sweep split into
# 5+5 halves (the 10-member x 4000-epoch footprint triggered the axon
# device error that preceded the outage). Waits for the tunnel first.
set -u
cd /root/repo
OUT=runs/r3
mkdir -p $OUT

echo "waiting for TPU tunnel..."
until timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); (x@x).block_until_ready()" 2>/dev/null; do
  sleep 120
done
echo "tunnel up $(date)"

sweep () {
  ds=$1; name=$2; seeds=$3; shift 3
  echo "=== $ds $name ($seeds) $(date +%H:%M)"
  python -u -m structured_latent_odes_tpu.sweep $ds --seeds $seeds \
    --results-root $OUT/$name "$@" > $OUT/$name.log 2>&1
  tail -3 $OUT/$name.log
}

sweep proc proc_4000ep_a 12..16 --split 1 --num-epochs 4000
sweep proc proc_4000ep_b 17..21 --split 1 --num-epochs 4000

sweep challenge chal_lrdecay_4000ep 12..19 --split 5 --data-seed 12 \
  --num-epochs 4000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
  --lr-final 1e-4 --lr-decay-start 2500

sweep proc heldout_4000ep_a 12..16 --heldout R33S34_Y81C76 --num-epochs 4000
sweep proc heldout_4000ep_b 17..21 --heldout R33S34_Y81C76 --num-epochs 4000

echo "QUEUE14 DONE"
