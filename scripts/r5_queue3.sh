#!/bin/bash
# Round-5 queue 3 (= queue 37) — BLIND trial of AVERAGED deployments.
#
# Queue 36B's offline analysis picked these deployment rules; this commit
# PRE-REGISTERS them before any of the seeds below is trained:
#
#   CVS       -> VETO-MEAN  (guard + prior-veto the pool, average survivors'
#                            mu_50 predictions)  [offline: plain mean's prior
#                            is dragged by degenerate members]
#   challenge -> PLAIN MEAN (average all members' mu_50)  [offline: mean beat
#                            median 5/5 and selection 4/5 on challenge]
#   proc      -> VETO-MEAN  (conservative default; no valid offline proc
#                            datapoint existed — this sweep pins a SHARED
#                            fold membership via --data-seed 12, unlike all
#                            archived proc sweeps)
#
# Pass criterion: the deployed (averaged) predictor beats every published
# anchor for its workload — CVS 0.520/0.522, challenge fold-5 38.620/38.969,
# proc split-1 6.019/16.524. Deployment computed by
# scripts/r5_queue3_report.py from the artifacts, with no human choice.
#
# Seeds are brand-new and untouched: CVS 172..181, challenge 110..117,
# proc 80..87.
set -e -o pipefail
cd "$(dirname "$0")/.."
OUT=runs/r5
EV=runs_evidence/r5
mkdir -p $OUT $EV

sweep () {
  ds=$1; name=$2; seeds=$3; shift 3
  echo "=== $name ($ds seeds $seeds) $(date +%H:%M) ==="
  python -u -m structured_latent_odes_tpu.sweep "$ds" --seeds "$seeds" \
    --results-root $OUT/$name --evidence-dir $EV "$@" 2>&1 | tail -4
}

sweep cvs cvs_avg_blind 172..181 --reference-data-dir /root/reference/data/cvs \
  --num-epochs 5000 --aux-loss-multiplier 460 \
  --aux-mult-start 46 --aux-warmup-epochs 1500 \
  --lr-final 5e-5 --lr-decay-start 2000

sweep challenge chal_avg_blind 110..117 --split 5 --data-seed 12 \
  --num-epochs 3000 --mini-batch-size 8 \
  --aux-loss-multiplier 460 --aux-mult-final 46 --aux-anneal-epochs 1500 \
  --lr-final 1e-4 --lr-decay-start 2000

sweep proc proc_avg_blind 80..87 --split 1 --data-seed 12 --num-epochs 4000

echo "R5 QUEUE3 DONE $(date +%H:%M)"
