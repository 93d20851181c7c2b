"""Test-time ``.npy`` artifact contract.

The reference's de-facto serialization interface: at test time it dumps
observations/labels/times plus mu_25/50/75, solution_xt and z per tag
(post/prior) into ``results_<Model>/`` (/root/reference/utils/plotting.py:
117-126,174-183,217-227) — the six eval notebooks consume exactly these
files. We reproduce the contract byte-for-byte (same filenames, same array
layouts) so the reference's evaluation workflows run unchanged.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def results_dir(model_name: str, root: str = ".") -> str:
    d = os.path.join(root, f"results_{model_name}")
    os.makedirs(d, exist_ok=True)
    return d


def dump_common(out_dir: str, observations, times, labels: Dict[str, np.ndarray]) -> None:
    np.save(os.path.join(out_dir, "observations"), np.asarray(observations))
    np.save(os.path.join(out_dir, "times"), np.asarray(times))
    for name, arr in labels.items():
        np.save(os.path.join(out_dir, name), np.asarray(arr))


def dump_recon(out_dir: str, tag: str, results: Dict[str, np.ndarray]) -> None:
    """tag is 'post' or 'prior'."""
    for key in ("mu_50", "mu_75", "mu_25"):
        np.save(os.path.join(out_dir, f"{key}_{tag}"), np.asarray(results[key]))
    np.save(os.path.join(out_dir, f"solution_xt_{tag}"), np.asarray(results["solution_xt"]))
    np.save(os.path.join(out_dir, f"z_{tag}"), np.asarray(results["z"]))


def dump_sample_bands(out_dir: str, tag: str, mu_25, mu_50, mu_75) -> None:
    """The proc/challenge 200-draw sample dump: arrays stacked on a trailing
    sample axis, filenames ``mu_{25,50,75}_{post,prior}_sample.npy``
    (training_proc.py:205-223)."""
    np.save(os.path.join(out_dir, f"mu_25_{tag}_sample"), np.asarray(mu_25))
    np.save(os.path.join(out_dir, f"mu_50_{tag}_sample"), np.asarray(mu_50))
    np.save(os.path.join(out_dir, f"mu_75_{tag}_sample"), np.asarray(mu_75))
