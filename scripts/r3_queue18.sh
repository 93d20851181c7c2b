#!/bin/bash
# Queue 18: fresh-decade validation of the proc headlines AT THE HEADLINE
# HORIZON. The current table's fresh-decade brackets for proc split-1 and
# heldout h22 were run at the old 2500-epoch horizon (queue 7); the 4000-
# epoch headline (queues 14+16) was only ever measured on the selection
# decade s12..21. Run never-used seeds s22..31 at horizon 4000 so the
# bracketed numbers validate the recipe actually being claimed.
# Heldout runs as two 5-seed halves (axon device-abort footprint).
set -e
cd "$(dirname "$0")/.."
OUT=runs/r3
mkdir -p $OUT

sweep () {  # name seeds extra...
  name=$1; seeds=$2; shift 2
  echo "=== proc $name ($seeds) $(date -u +%H:%M)"
  python -u -m structured_latent_odes_tpu.sweep proc --seeds "$seeds" \
    --results-root $OUT/$name --num-epochs 4000 \
    "$@" 2>&1 | grep -v "^WARNING" | tail -12
}

sweep proc_h4000_fresh_a 22..26 --split 1
sweep proc_h4000_fresh_b 27..31 --split 1
sweep heldout_h4000_fresh_a 22..26 --heldout R33S34_Y81C76
sweep heldout_h4000_fresh_b 27..31 --heldout R33S34_Y81C76

echo "QUEUE18 DONE"
