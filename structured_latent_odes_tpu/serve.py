"""Inference / serving entry point (capability upgrade — the reference has no
way to reuse a trained model: weights are never saved, SURVEY.md §5).

Library use::

    from structured_latent_odes_tpu.serve import load_model, make_predict_fns
    spec, params, ts = load_model("cvs", "results_Mechanistic/best_model.npz")
    recon_fn, classify_fn = make_predict_fns(spec, ts)
    out = recon_fn(params, key, batch, True)

CLI::

    python -m structured_latent_odes_tpu.serve --dataset cvs \
        --checkpoint results_Mechanistic/best_model.npz \
        --split test --output preds.npz [--prior] [--classify]

Passing MULTIPLE checkpoints serves the ensemble-MEAN predictor (the
averaged deployment validated in RESULTS.md queues 36B/37): trajectory
outputs (mu_25/50/75, std, solution_xt, z) are averaged across members,
``l1`` is recomputed from the averaged ``mu_50`` with the same masked
bookkeeping, and ``--classify`` labels combine by majority vote::

    python -m structured_latent_odes_tpu.serve --dataset challenge \
        --checkpoint runs/sweep/seed*/results_Mechanistic/best_model.npz \
        --split val --output preds.npz
"""

from __future__ import annotations

import argparse
import functools

import jax
import numpy as np

from structured_latent_odes_tpu.data.configs import LOADERS
from structured_latent_odes_tpu.models import (
    challenge_spec,
    classifier,
    cvs_spec,
    init_params,
    proc_spec,
    recon,
)
from structured_latent_odes_tpu.train import checkpoint


def _build(dataset: str, config):
    """Returns (spec, splits_in_model_layout, times)."""
    if dataset == "cvs":
        from structured_latent_odes_tpu.training_cvs import build_splits

        splits, _ = build_splits(config)
        times = np.arange(0.0, config.seq_len * config.delta_t, config.delta_t, dtype=np.float32)
        return cvs_spec(config), splits, times
    if dataset == "proc":
        from structured_latent_odes_tpu.data import proc as proc_data

        splits, times = proc_data.build_splits(config)
        return proc_spec(config, n_time=len(times)), splits, times
    if dataset == "challenge":
        from structured_latent_odes_tpu.data import challenge as challenge_data
        from structured_latent_odes_tpu.data.loader import normalize_split, to_model_layout
        from structured_latent_odes_tpu.data.transforms import create_transforms

        raw_splits, norm_params, times = challenge_data.build_datasets(config)
        transforms = create_transforms(config.norm, norm_params)
        splits = {
            k: to_model_layout(normalize_split(v, transforms)) for k, v in raw_splits.items()
        }
        return challenge_spec(config, n_time=len(times)), splits, times
    raise ValueError(dataset)


def load_model(dataset: str, checkpoint_path: str, config=None):
    """Restore a trained model. Returns (spec, params, times, splits)."""
    config = config or LOADERS[dataset]()
    spec, splits, times = _build(dataset, config)
    like = init_params(jax.random.key(0), spec)
    params = checkpoint.restore(checkpoint_path, like)
    return spec, params, times, splits


def make_predict_fns(spec, times):
    """Jitted (recon_fn, classify_fn) for serving."""
    ts = np.asarray(times)
    recon_fn = functools.partial(jax.jit, static_argnames=("is_post",))(
        lambda params, key, batch, is_post: recon(spec, params, key, batch, ts, is_post)
    )
    classify_fn = jax.jit(lambda params, key, obs: classifier(spec, params, key, obs))
    return recon_fn, classify_fn


def _combine_labels(spec, preds_list):
    """Majority-vote / mean combination of per-member classifier outputs:
    bernoulli -> vote share re-thresholded at 0.5, onehot -> argmax of the
    vote distribution re-onehotted, continuous -> mean."""
    kinds = {label.name: label.kind for label in spec.labels}
    out = {}
    for k in preds_list[0]:
        stack = np.stack([np.asarray(p[k]) for p in preds_list])
        mean = stack.mean(0)
        kind = kinds.get(k, "continuous")
        if kind == "bernoulli":
            out[k] = (mean > 0.5).astype(stack.dtype)
        elif kind == "onehot":
            idx = mean.argmax(-1)
            out[k] = np.eye(mean.shape[-1], dtype=stack.dtype)[idx]
        else:
            out[k] = mean
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", choices=["cvs", "proc", "challenge"], required=True)
    p.add_argument(
        "--checkpoint", required=True, nargs="+",
        help="one checkpoint, or several for the ensemble-mean predictor",
    )
    p.add_argument("--split", default="test", help="dataset split (or 'val')")
    p.add_argument("--output", default="preds.npz")
    p.add_argument("--prior", action="store_true", help="reconstruct from the conditional prior")
    p.add_argument("--classify", action="store_true", help="also emit label predictions")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    spec, params, times, splits = load_model(args.dataset, args.checkpoint[0])
    like = init_params(jax.random.key(0), spec)
    params_list = [params] + [
        checkpoint.restore(c, like) for c in args.checkpoint[1:]
    ]
    split = splits.get(args.split) or splits["val"]
    batch = {k: jax.device_put(v) for k, v in split.items()}
    recon_fn, classify_fn = make_predict_fns(spec, times)

    key = jax.random.key(args.seed)
    rs = [recon_fn(p, key, batch, not args.prior) for p in params_list]
    out = {
        k: np.mean([np.asarray(r[k]) for r in rs], axis=0)
        for k in rs[0]
        if k != "l1"
    }
    # the averaged predictor's own masked L1, same bookkeeping as recon's
    # _masked_mean_abs (per-sample mask broadcast over channels x time)
    mask = split.get("mask")
    err = np.abs(out["mu_50"] - np.asarray(split["observations"]))
    if mask is not None:
        w = np.asarray(mask)[:, None, None]
        out["l1"] = np.sum(err * w) / max(
            float(w.sum()) * err.shape[1] * err.shape[2], 1.0
        )
    else:
        out["l1"] = err.mean()
    if args.classify:
        preds_list = [
            classify_fn(p, key, batch["observations"]) for p in params_list
        ]
        combined = _combine_labels(spec, preds_list)
        out.update({f"pred_{k}": v for k, v in combined.items()})
    np.savez(args.output, **out)
    tag = "prior" if args.prior else "posterior"
    ens = f", ensemble-mean of {len(params_list)}" if len(params_list) > 1 else ""
    print(
        f"wrote {args.output}: l1={float(out['l1']):.6f} "
        f"mu_50 {out['mu_50'].shape} ({tag}{ens})"
    )


if __name__ == "__main__":
    main()
