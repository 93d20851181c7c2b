"""Summarize round-5 queue 1: blind veto-selection validation + EMA decade.

Reads the runs_evidence/r5 sweep.jsons the queue produced and prints
(a) the blind anchor table for the selected member per workload and
(b) the per-seed paired EMA-vs-snapshot comparison for the CVS EMA decade.

Usage: python scripts/r5_queue1_report.py
"""

import json
import os

import numpy as np

EV = "runs_evidence/r5"

ANCHORS = {
    # workload: (post anchor, prior anchor) — BASELINE.md
    "cvs_blind3_sel": (0.520, 0.522),  # round-2 reference-rerun CVS anchors
    "chal_blind3_sel": (38.620, 38.969),
    "proc_blind3_sel": (6.019, 16.524),
    "heldout_blind3_sel": (5.874, None),
}


def load(name):
    p = os.path.join(EV, f"{name}.sweep.json")
    return json.load(open(p)) if os.path.exists(p) else None


def main():
    print("=== Part A: blind veto-selection validation ===")
    passes = total = 0
    for name, (a_post, a_prior) in ANCHORS.items():
        d = load(name)
        if d is None:
            print(f"{name}: MISSING")
            continue
        s = d["selected"]
        ok_post = s["l1_post"] < a_post
        ok_prior = a_prior is None or s["l1_prior"] < a_prior
        verdict = "pass both" if (ok_post and ok_prior) else "MISS"
        passes += ok_post and ok_prior
        total += 1
        posts = [m["l1_post"] for m in d["members"]]
        priors = [m["l1_prior"] for m in d["members"]]
        print(
            f"{name}: selected seed {s['seed']} post {s['l1_post']:.3f} vs "
            f"{a_post} | prior {s['l1_prior']:.3f} vs {a_prior} -> {verdict} "
            f"(vetoed {s.get('n_prior_vetoed')}; member medians "
            f"{np.median(posts):.3f}/{np.median(priors):.3f})"
        )
    print(f"blind tally: {passes}/{total}")

    print("\n=== Part B: CVS tail-EMA decade (paired per-seed) ===")
    d = load("cvs_ema_decade")
    if d is None:
        print("cvs_ema_decade: MISSING")
        return
    a_post, a_prior = ANCHORS["cvs_blind3_sel"]
    rows, wins_post, wins_prior = [], 0, 0
    snap_both = ema_both = 0
    for m in d["members"]:
        e = m["ema"]
        dp = e["l1_post"] - m["l1_post"]
        dq = e["l1_prior"] - m["l1_prior"]
        wins_post += dp < 0
        wins_prior += dq < 0
        snap_both += m["l1_post"] < a_post and m["l1_prior"] < a_prior
        ema_both += e["l1_post"] < a_post and e["l1_prior"] < a_prior
        rows.append((m["seed"], m["l1_post"], e["l1_post"], dp,
                     m["l1_prior"], e["l1_prior"], dq))
        print(
            f"seed {m['seed']}: post {m['l1_post']:.3f} -> ema "
            f"{e['l1_post']:.3f} ({dp:+.3f}) | prior {m['l1_prior']:.3f} -> "
            f"ema {e['l1_prior']:.3f} ({dq:+.3f})"
        )
    n = len(rows)
    print(
        f"EMA wins post {wins_post}/{n}, prior {wins_prior}/{n}; "
        f"both-anchor rate snapshot {snap_both}/{n} vs EMA {ema_both}/{n}; "
        f"median deltas post {np.median([r[3] for r in rows]):+.3f} "
        f"prior {np.median([r[6] for r in rows]):+.3f}"
    )


if __name__ == "__main__":
    main()
