"""Summarize round-5 queue 2: cross-fold generality of veto'd selection.

Pass criterion (pre-registered in scripts/r5_queue2.sh before training):
the selected member beats its own fold/split's queue-19 full-decade median
on BOTH post and prior L1.

Usage: python scripts/r5_queue2_report.py
"""

import json
import os

import numpy as np

EV = "runs_evidence/r5"

# (name, q19 post median, q19 prior median) — RESULTS.md queue 19 tables
TARGETS = [
    ("chal_cv_sel_fold1", 36.40, 44.99),
    ("chal_cv_sel_fold2", 31.61, 32.75),
    ("chal_cv_sel_fold3", 41.69, 39.02),
    ("chal_cv_sel_fold4", 38.39, 43.93),
    ("proc_cv_sel_split2", 3.87, 15.73),
    ("proc_cv_sel_split3", 3.27, 15.71),
    ("proc_cv_sel_split4", 3.93, 15.60),
]


def main():
    passes = total = 0
    for name, med_post, med_prior in TARGETS:
        p = os.path.join(EV, f"{name}.sweep.json")
        if not os.path.exists(p):
            print(f"{name}: MISSING")
            continue
        d = json.load(open(p))
        s = d["selected"]
        ok = s["l1_post"] < med_post and s["l1_prior"] < med_prior
        posts = [m["l1_post"] for m in d["members"]]
        priors = [m["l1_prior"] for m in d["members"]]
        passes += ok
        total += 1

        # do the training-time signals even rank the test metrics on this
        # fold? (Spearman rho; selection can only work where they do)
        def spearman(a, b):
            ra = np.argsort(np.argsort(a)).astype(float)
            rb = np.argsort(np.argsort(b)).astype(float)
            ra -= ra.mean()
            rb -= rb.mean()
            return float((ra * rb).sum() / np.sqrt((ra**2).sum() * (rb**2).sum()))

        crits = [m["criterion"] for m in d["members"]]
        sel_p = [m["sel_prior_l1"] for m in d["members"]]
        rho_post = spearman(crits, posts)
        rho_prior = spearman(sel_p, priors)
        print(
            f"{name}: selected seed {s['seed']} post {s['l1_post']:.3f} vs "
            f"q19med {med_post} | prior {s['l1_prior']:.3f} vs {med_prior} -> "
            f"{'pass' if ok else 'MISS'} (vetoed {s.get('n_prior_vetoed')}; "
            f"own-sweep medians {np.median(posts):.3f}/{np.median(priors):.3f}; "
            f"rho crit-post {rho_post:+.2f}, selprior-prior {rho_prior:+.2f})"
        )
    print(f"cross-fold tally: {passes}/{total}")


if __name__ == "__main__":
    main()
