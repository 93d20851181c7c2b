#!/usr/bin/env python
"""Cross-validation sweep runner: train every fold, aggregate the notebook
metrics (the reference's manual per-fold workflow + the ``average()``
aggregator of sbio_eval_folds_final.ipynb cell 11, automated).

Usage:
  python scripts/run_folds.py challenge --num-epochs 500 [--folds 1 2 ...]
  python scripts/run_folds.py proc --num-epochs 2500
  python scripts/run_folds.py proc-heldout --heldout R33S34_Y81C76 ...

Each fold trains into results-root ``runs/<dataset>/fold<k>/`` and the sweep
ends with a JSON summary of per-fold and mean aggregate L1 (post and prior).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", choices=["challenge", "proc", "proc-heldout"])
    p.add_argument("--num-epochs", type=int, default=None)
    p.add_argument("--folds", type=int, nargs="*", default=None)
    p.add_argument("--heldout", default="R33S34_Y81C76")
    p.add_argument("--model", default="Mechanistic")
    p.add_argument("--out-root", default="runs")
    p.add_argument("--num-samples", type=int, default=None)
    args = p.parse_args()

    from structured_latent_odes_tpu.eval.metrics import (
        challenge_outcome_averaged_l1,
        synbio_device_averaged_l1,
        synbio_heldout_l1,
    )

    results = {}

    def run_one(tag, argv, metric_fn):
        root = os.path.join(args.out_root, args.dataset, tag)
        os.makedirs(root, exist_ok=True)
        argv = argv + ["--results-root", root, "--no-plot", "--no-eval-train", "--model", args.model]
        if args.num_epochs is not None:
            argv += ["--num-epochs", str(args.num_epochs)]
        if args.num_samples is not None:
            argv += ["--num-samples", str(args.num_samples)]
        print(f"=== {args.dataset} {tag}: {' '.join(argv)}")
        if args.dataset == "challenge":
            from structured_latent_odes_tpu.training_challenge import main as train_main
        else:
            from structured_latent_odes_tpu.training_proc import main as train_main
        train_main(argv)
        rd = os.path.join(root, f"results_{args.model}")
        results[tag] = {t: metric_fn(rd, t) for t in ("post", "prior")}
        print(f"--- {tag}: {results[tag]}")

    if args.dataset == "challenge":
        folds = args.folds or [1, 2, 3, 4, 5]
        for k in folds:
            run_one(f"fold{k}", ["--split", str(k)], challenge_outcome_averaged_l1)
    elif args.dataset == "proc":
        folds = args.folds or [1, 2, 3, 4]
        for k in folds:
            run_one(f"fold{k}", ["--split", str(k)], synbio_device_averaged_l1)
    else:
        run_one(
            f"heldout_{args.heldout}", ["--heldout", args.heldout], synbio_heldout_l1
        )

    summary = {
        "dataset": args.dataset,
        "folds": results,
        "mean_post": float(sum(r["post"] for r in results.values()) / len(results)),
        "mean_prior": float(sum(r["prior"] for r in results.values()) / len(results)),
    }
    out_path = os.path.join(args.out_root, args.dataset, "summary.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
