"""Aggregate evaluation figures (the reference notebooks' plots).

Class/outcome-averaged trajectory bands and the synbio end-point
dose-response scatter, rendered from the ``.npy`` artifacts.
"""

from __future__ import annotations

import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from structured_latent_odes_tpu.eval.metrics import load_artifacts  # noqa: E402


def class_averaged_bands(
    results_dir: str, tag: str, label_names, channel_names, out_name: str
) -> str:
    """Rows = label columns, cols = channels; one averaged band per label
    value (cvs_eval_final / challenge_eval_folds style)."""
    a = load_artifacts(results_dir, tag)
    labels = np.stack([a[n].reshape(-1) for n in label_names], axis=1)
    K = a["y"].shape[1]
    fig, axs = plt.subplots(
        len(label_names), K, sharex=True, sharey=True, figsize=(3 * K, 2.2 * len(label_names)),
        squeeze=False,
    )
    colors = ("tab:blue", "tab:red")
    for r, lname in enumerate(label_names):
        for v, color in zip((0.0, 1.0), colors):
            idx = labels[:, r] == v
            if idx.sum() == 0:
                continue
            y_av = a["y"][idx].mean(0)
            mu_av = a["mu_50"][idx].mean(0)
            lo_av = a["mu_25"][idx].mean(0)
            hi_av = a["mu_75"][idx].mean(0)
            for c in range(K):
                ax = axs[r][c]
                ax.plot(a["times"], y_av[c], ".", ms=2, color=color,
                        label=f"{lname}={int(v)}" if c == 0 else None)
                ax.plot(a["times"], mu_av[c], "-", lw=1.5, color=color, alpha=0.8)
                ax.fill_between(a["times"], lo_av[c], hi_av[c], color=color, alpha=0.12)
                if r == 0:
                    ax.set_title(channel_names[c])
        axs[r][0].set_ylabel(lname)
        axs[r][0].legend(fontsize=7)
    fig.supxlabel("Time")
    fig.supylabel("Normalized output")
    fig.tight_layout()
    path = os.path.join(results_dir, out_name)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def synbio_dose_response(results_dir: str, tag: str, channel_names, out_name: str) -> str:
    """End-point value vs dose per device/condition (sbio notebook cells 5-7)."""
    a = load_artifacts(results_dir, tag)
    treatment, devices = a["treatments"], a["devices"]
    unique_devices = np.unique(devices, axis=0)
    K = a["y"].shape[1]
    fig, axs = plt.subplots(
        len(unique_devices), K, sharex=True, sharey=True,
        figsize=(2.6 * K, 2.0 * len(unique_devices)), squeeze=False,
    )
    cond_colors = ("tab:green", "tab:purple")
    for r, device in enumerate(unique_devices):
        sel_device = np.all(devices == device, axis=1)
        for ci, color in enumerate(cond_colors):
            for treat in np.unique(treatment):
                idx = (treatment[:, ci] == treat) & sel_device
                if idx.sum() == 0:
                    continue
                y_end = a["y"][idx].mean(0)[:, -1]
                mu_end = a["mu_50"][idx].mean(0)[:, -1]
                for c in range(K):
                    axs[r][c].scatter(treat, y_end[c], marker="x", s=14, color=color)
                    axs[r][c].scatter(treat, mu_end[c], marker="o", s=14,
                                      facecolors="none", edgecolors=color)
        for c in range(K):
            if r == 0:
                axs[r][c].set_title(channel_names[c])
        axs[r][0].set_ylabel("dev " + "".join(str(int(x)) for x in device), fontsize=7)
    fig.supxlabel("log1p dose (x=data, o=model)")
    fig.supylabel("End-point output")
    fig.tight_layout()
    path = os.path.join(results_dir, out_name)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
