#!/bin/bash
# Round-3 queue 7: proc fresh-seed-decade validation (split 1 + heldout h22)
# — seeds never used for recipe selection; completes the fresh-decade story
# (CVS + challenge already validated in queue 6).
set -u
cd /root/repo
OUT=runs/r3
mkdir -p $OUT

sweep () {
  ds=$1; name=$2; seeds=$3; shift 3
  echo "=== $ds $name ($seeds)"
  python -u -m structured_latent_odes_tpu.sweep $ds --seeds $seeds \
    --results-root $OUT/$name "$@" > $OUT/$name.log 2>&1
  tail -3 $OUT/$name.log
}

sweep proc proc_headline_fresh_seeds 22..31 --split 1
# heldout runs as 5+5 halves (transient axon device errors at 10 members)
sweep proc heldout_fresh_a 22..26 --heldout R33S34_Y81C76
sweep proc heldout_fresh_b 27..31 --heldout R33S34_Y81C76

echo "QUEUE7 DONE"
