#!/usr/bin/env python3
"""Best-of-ensemble selection analysis over saved sweep.json evidence.

For each sweep, applies ``structured_latent_odes_tpu.sweep.select_member``
(criterion + selection-split prior-L1 rank-combine when ``sel_prior_l1`` is
recorded — round-4 rule; criterion argmin for older sweeps — with the
converged-epoch guard) and reports the selected member's TEST metrics next to
the reference anchors.  This is the deploy-time recipe evaluation: selection
uses only training-time signals; test metrics are read out afterwards.  Note
proc_heldout sweeps have no validation signal at all — their criterion is the
FINAL epoch's mean train loss (training_proc.py:389-393 overwrite policy).

Usage::

  python scripts/best_of_ensemble.py runs_evidence/r3/cvs_headline_fresh_*.sweep.json \
      --anchor-post 0.520 --anchor-prior 0.522 [--min-best-epoch auto]

``--min-best-epoch auto`` (default) uses each sweep's own
``config.lr_decay_start`` (0 when the recipe has no decay).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from structured_latent_odes_tpu.sweep import select_member  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sweeps", nargs="+", help="sweep.json paths")
    p.add_argument("--anchor-post", type=float, default=None)
    p.add_argument("--anchor-prior", type=float, default=None)
    p.add_argument("--min-best-epoch", default="auto",
                   help="'auto' = each sweep's lr_decay_start, or an int")
    args = p.parse_args()

    n_post = n_both = 0
    for path in args.sweeps:
        d = json.load(open(path))
        # guard mirrors epoch_lr_scale's activation: decay (and a converged
        # epoch to guard on) exists only when BOTH lr knobs are set
        has_decay = (
            d["config"].get("lr_decay_start") and d["config"].get("lr_final")
        )
        guard = (
            int(d["config"]["lr_decay_start"]) if has_decay else 0
        ) if args.min_best_epoch == "auto" else int(args.min_best_epoch)
        b = select_member(d["members"], min_best_epoch=guard)
        beats_post = args.anchor_post is not None and b["l1_post"] < args.anchor_post
        beats_prior = (
            args.anchor_prior is not None and b["l1_prior"] < args.anchor_prior
        )
        n_post += beats_post
        n_both += beats_post and (args.anchor_prior is None or beats_prior)
        # only claim BOTH when a prior anchor was actually supplied
        verdict = (
            "BOTH" if beats_post and beats_prior
            else "post" if beats_post else "miss"
        ) if args.anchor_post is not None else "-"
        name = path.rsplit("/", 1)[-1].replace(".sweep.json", "")
        flag = " GUARD-FALLBACK" if b.get("guard_fallback") else ""
        print(
            f"{name:36s} S={len(d['members']):2d} guard>={guard:4d} "
            f"pick seed {b['seed']:3d} (ep {b['best_epoch']:4d}): "
            f"post {b['l1_post']:.4f}  prior {b['l1_prior']:.4f}  [{verdict}]{flag}"
        )
    if args.anchor_post is not None:
        both_label = (
            "both anchors" if args.anchor_prior is not None else "the post anchor"
        )
        print(
            f"=> selected member beats post anchor in {n_post}/{len(args.sweeps)} "
            f"sweeps, {both_label} in {n_both}/{len(args.sweeps)}"
        )


if __name__ == "__main__":
    main()
