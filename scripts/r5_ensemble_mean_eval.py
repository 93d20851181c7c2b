"""Deep-ensemble (prediction-mean) deployment vs member selection — offline.

Queue 36 showed best-of-ensemble selection lands near the pool median off
the anchor folds because the training-time signals decorrelate from test
metrics fold-by-fold. The classical alternative needs no signals at all:
average the members' predictions. All headline metrics consume the per-seed
``mu_50_{tag}.npy`` artifact, and every member of a sweep shares the same
test split/ordering, so the ensemble-mean predictor is computable offline
from the artifacts already on disk: mean the members' mu_50 and run the
SAME notebook accumulation (eval/metrics.py).

Prints, per sweep: selected-member metric, member median, ensemble-mean
metric, for post and prior. No training, no TPU.

Usage: python scripts/r5_ensemble_mean_eval.py [sweep_dir ...]
       (default: the queue 35/36 sweeps under runs/r5)
"""

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from structured_latent_odes_tpu.eval import metrics as EM

METRIC = {
    "cvs": EM.cvs_class_averaged_l1,
    "challenge": EM.challenge_outcome_averaged_l1,
    "proc": EM.synbio_device_averaged_l1,
}

DEFAULT = [
    "runs/r5/cvs_blind3_sel",
    "runs/r5/chal_blind3_sel",
    "runs/r5/proc_blind3_sel",
    "runs/r5/chal_cv_sel_fold1",
    "runs/r5/chal_cv_sel_fold2",
    "runs/r5/chal_cv_sel_fold3",
    "runs/r5/chal_cv_sel_fold4",
    "runs/r5/proc_cv_sel_split2",
    "runs/r5/proc_cv_sel_split3",
    "runs/r5/proc_cv_sel_split4",
    "runs/r5/cvs_ema_decade",
]


class _MeanDir:
    """Duck-typed results_dir: serves the member-mean mu_50 for the metric's
    np.load calls by materializing an overlay dir of symlinks + one file."""

    def __init__(self, member_dirs, tag, tmp):
        os.makedirs(tmp, exist_ok=True)
        self.path = tmp
        first = member_dirs[0]
        for f in os.listdir(first):
            dst = os.path.join(tmp, f)
            if os.path.lexists(dst):
                os.unlink(dst)
            os.symlink(os.path.abspath(os.path.join(first, f)), dst)
        mu = np.mean(
            [np.load(os.path.join(d, f"mu_50_{tag}.npy")) for d in member_dirs],
            axis=0,
        )
        dst = os.path.join(tmp, f"mu_50_{tag}.npy")
        os.unlink(dst)
        np.save(dst, mu)


def main():
    roots = sys.argv[1:] or DEFAULT
    rows = []
    for root in roots:
        sj = os.path.join(root, "sweep.json")
        if not os.path.exists(sj):
            print(f"{root}: MISSING sweep.json")
            continue
        d = json.load(open(sj))
        ds = d["dataset"]
        fn = METRIC[ds]
        if ds == "proc" and d["config"].get("data_seed") is None:
            # fold membership falls back to the member seed (reference quirk,
            # data/proc.py::split_folds) -> members have DIFFERENT val sets;
            # prediction averaging is ill-defined on these archives
            print(f"{os.path.basename(root)}: SKIP (per-member fold membership; "
                  "rerun with --data-seed for a shared split)")
            continue
        name = os.path.basename(root)
        sel = d["selected"]

        def mdir(m):
            return os.path.join(root, f"seed{m['seed']}", "results_Mechanistic")

        all_dirs = [mdir(m) for m in d["members"]]
        # veto-filtered pool: replicate select_member's guard + prior veto
        # (sweep.py::select_member) and average only the survivors
        guard = d["selected"].get("min_best_epoch", 0)
        eligible = [m for m in d["members"] if m["best_epoch"] >= guard]
        pool = eligible or d["members"]
        best_sp = min(m["sel_prior_l1"] for m in pool)
        margin = d["selected"].get("prior_veto_margin", 0.05)
        survivors = [m for m in pool if m["sel_prior_l1"] <= best_sp * (1 + margin)]
        surv_dirs = [mdir(m) for m in survivors]

        out = {"name": name, "n": len(all_dirs), "k": len(surv_dirs)}
        for tag, key in (("post", "l1_post"), ("prior", "l1_prior")):
            ens = fn(_MeanDir(all_dirs, tag, f"/tmp/ens_mean/{name}_{tag}").path, tag)
            vens = fn(_MeanDir(surv_dirs, tag, f"/tmp/ens_mean/{name}_{tag}_v").path, tag)
            med = float(np.median([m[key] for m in d["members"]]))
            out[tag] = (sel[key], med, ens, vens)
        rows.append(out)
        print(
            f"{name} (S={out['n']}, survivors {out['k']}): "
            f"post sel {out['post'][0]:.3f} | med {out['post'][1]:.3f} | "
            f"mean {out['post'][2]:.3f} | VETO-MEAN {out['post'][3]:.3f}   "
            f"prior sel {out['prior'][0]:.3f} | med {out['prior'][1]:.3f} | "
            f"mean {out['prior'][2]:.3f} | VETO-MEAN {out['prior'][3]:.3f}"
        )
    n = len(rows)
    for tag in ("post", "prior"):
        for label, idx in (("mean", 2), ("veto-mean", 3)):
            beats_sel = sum(r[tag][idx] < r[tag][0] for r in rows)
            beats_med = sum(r[tag][idx] < r[tag][1] for r in rows)
            print(
                f"{label} beats selected on {tag}: {beats_sel}/{n}; "
                f"beats member median: {beats_med}/{n}"
            )


if __name__ == "__main__":
    main()
