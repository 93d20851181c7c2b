"""Summarize round-5 queue 3 (= queue 37): blind averaged-deployment trial.

Deployment rules PRE-REGISTERED in scripts/r5_queue3.sh (committed before
training): CVS -> veto-mean, challenge -> plain mean, proc -> veto-mean.
Pass = the averaged predictor beats every published anchor.

Usage: python scripts/r5_queue3_report.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from r5_ensemble_mean_eval import METRIC, _MeanDir  # noqa: E402

# name -> (deployment, post anchor, prior anchor)
PLAN = [
    ("cvs_avg_blind", "veto-mean", 0.520, 0.522),
    ("chal_avg_blind", "mean", 38.620, 38.969),
    ("proc_avg_blind", "veto-mean", 6.019, 16.524),
]


def deploy_metric(root, deployment, tag):
    d = json.load(open(os.path.join(root, "sweep.json")))
    fn = METRIC[d["dataset"]]

    def mdir(m):
        return os.path.join(root, f"seed{m['seed']}", "results_Mechanistic")

    members = d["members"]
    if deployment == "veto-mean":
        guard = d["selected"].get("min_best_epoch", 0)
        pool = [m for m in members if m["best_epoch"] >= guard] or members
        best = min(m["sel_prior_l1"] for m in pool)
        margin = d["selected"].get("prior_veto_margin", 0.05)
        members = [m for m in pool if m["sel_prior_l1"] <= best * (1 + margin)]
    dirs = [mdir(m) for m in members]
    name = os.path.basename(root)
    md = _MeanDir(dirs, tag, f"/tmp/ens_mean/q37_{name}_{deployment}_{tag}")
    return fn(md.path, tag), len(dirs), len(d["members"])


def main():
    passes = total = 0
    for name, deployment, a_post, a_prior in PLAN:
        root = os.path.join("runs/r5", name)
        if not os.path.exists(os.path.join(root, "sweep.json")):
            print(f"{name}: MISSING")
            continue
        post, k, n = deploy_metric(root, deployment, "post")
        prior, _, _ = deploy_metric(root, deployment, "prior")
        d = json.load(open(os.path.join(root, "sweep.json")))
        med_post = float(np.median([m["l1_post"] for m in d["members"]]))
        med_prior = float(np.median([m["l1_prior"] for m in d["members"]]))
        sel = d["selected"]
        ok = post < a_post and prior < a_prior
        passes += ok
        total += 1
        print(
            f"{name} [{deployment}, {k}/{n} members]: post {post:.3f} vs "
            f"{a_post} | prior {prior:.3f} vs {a_prior} -> "
            f"{'pass both' if ok else 'MISS'} "
            f"(selected {sel['l1_post']:.3f}/{sel['l1_prior']:.3f}; member "
            f"medians {med_post:.3f}/{med_prior:.3f})"
        )
    print(f"blind averaged-deployment tally: {passes}/{total}")


if __name__ == "__main__":
    main()
