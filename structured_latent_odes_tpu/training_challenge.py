"""Human viral challenge training driver (reference
/root/reference/training_challenge.py).

Dataset-specific behaviors reproduced: 5-fold subject split with the val fold
doubling as the test set (one full batch, training_challenge.py:244-246);
best-model selection on the TRAIN epoch loss (:368-375); test-time
``multiple_samples`` dump of 200 reconstruction draws (:174-195).
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import numpy as np

from structured_latent_odes_tpu.data import challenge as challenge_data
from structured_latent_odes_tpu.data.configs import load_challenge_config
from structured_latent_odes_tpu.data.loader import normalize_split, to_model_layout
from structured_latent_odes_tpu.data.transforms import create_transforms
from structured_latent_odes_tpu.models import challenge_spec, init_params_fast
from structured_latent_odes_tpu.train import artifacts, checkpoint
from structured_latent_odes_tpu.train.driver import final_test_eval, run_training_epochs
from structured_latent_odes_tpu.train.backend import make_training_backend
from structured_latent_odes_tpu.train.svi import make_eval_epoch, make_eval_fns
from structured_latent_odes_tpu.utils import plotting, set_seed

log = logging.getLogger("slode")

CHANNELS = ("HR", "TEMP", "EDA", "ACC")


def multiple_samples(reconstruct, params, key, batch, num_samples: int, is_post: bool):
    """num_samples independent recon draws stacked on a trailing sample axis
    (training_challenge.py:174-195). Returns dict of (N, K, T, S) arrays."""
    mus = {"mu_25": [], "mu_50": [], "mu_75": []}
    for _ in range(num_samples):
        key, sub = jax.random.split(key)
        r = reconstruct(params, sub, batch, is_post)
        for k in mus:
            mus[k].append(np.asarray(r[k]))
    return {k: np.stack(v, axis=3) for k, v in mus.items()}


def train(config):
    print(config.to_json())
    log.debug(config.to_json())
    key = set_seed(config.seed)
    rng = np.random.RandomState(config.seed)

    raw_splits, norm_params, times = challenge_data.build_datasets(config)
    transforms = create_transforms(config.norm, norm_params)
    splits = {
        name: to_model_layout(normalize_split(split, transforms))
        for name, split in raw_splits.items()
    }
    for name in ("train", "val"):
        print(name.upper(), "obs=", splits[name]["observations"].shape)

    # static-batch efficiency: never pad beyond the (tiny) dataset size
    n_train = splits["train"]["observations"].shape[0]
    config.mini_batch_size = min(config.mini_batch_size, ((n_train + 7) // 8) * 8)

    spec = challenge_spec(config, n_time=len(times))
    key, k_init, k_train, k_eval = jax.random.split(key, 4)
    params = init_params_fast(k_init, spec)
    n_params = sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(params))
    print(f"Model: {config.model} - with {n_params} parameters.")

    init_state, train_step, train_epoch, put_batch = make_training_backend(
        spec, times, config, params
    )
    eval_fns = make_eval_fns(spec, times)
    state = init_state(params, k_train)
    out_dir = artifacts.results_dir(config.model, config.get("results_root", "."))

    def select_best(epoch, val, train_s, best, params_now, epoch_losses):
        # challenge policy: best epoch by mean TRAIN loss (:368-375)
        crit = float(np.mean(epoch_losses)) if epoch_losses else np.inf
        if crit < best["criterion"]:
            return {"params": params_now, "epoch": epoch, "criterion": crit}
        return best

    def on_epoch(epoch, state, val_post, val_prior, train_post, train_prior):
        if config.plot_epoch and epoch % config.plot_epoch == 0 and config.get("plot", True):
            plotting.plot_label_grid(
                out_dir,
                f"val_{epoch}_post",
                val_post.observations,
                val_post.recon,
                times,
                {
                    "symptoms": val_post.labels["symptoms"],
                    "shedding": val_post.labels["shedding"],
                },
                CHANNELS,
            )
            plotting.visualize_latent(
                out_dir, val_post.recon["z"], val_prior.recon["z"], epoch, config.seed
            )

    # val fold evaluated as one full batch (training_challenge.py:244-246)
    eval_bs = max(config.mini_batch_size, splits["val"]["observations"].shape[0])
    state, best = run_training_epochs(
        spec=spec,
        state=state,
        train_step=train_step,
        eval_fns=eval_fns,
        splits=splits,
        config=config,
        rng=rng,
        eval_key=k_eval,
        select_best=select_best,
        on_epoch=on_epoch,
        eval_train_stats=config.get("eval_train_stats", True),
        train_epoch=train_epoch,
        put_batch=put_batch,
        eval_every=config.get("eval_every", 1),
        checkpoint_path=os.path.join(out_dir, "train_state.npz"),
        checkpoint_every=config.get("checkpoint_every", 0),
        resume=config.get("resume", False),
        profile_dir=config.get("profile_dir"),
        fast_eval=make_eval_epoch(spec, times),
    )

    if int(config.get("prior_refit_epochs") or 0):
        # prior-only refit of the selected model (capability recipe; see
        # train/ensemble.make_prior_refit_fn): posterior untouched
        from structured_latent_odes_tpu.train.ensemble import prior_refit

        key, k_refit = jax.random.split(key)
        best = dict(best, params=prior_refit(
            spec, times, config.learning_rate, best["params"], k_refit,
            splits["train"], rng, int(config.prior_refit_epochs),
            config.mini_batch_size,
        ))

    key, k_test, k_samp = jax.random.split(key, 3)
    test_post, test_prior = final_test_eval(
        spec, best["params"], k_test, splits["val"], eval_fns, eval_bs
    )
    artifacts.dump_common(
        out_dir,
        test_post.observations,
        times,
        {
            "symptoms": test_post.labels["symptoms"].squeeze(-1),
            "shedding": test_post.labels["shedding"].squeeze(-1),
        },
    )
    artifacts.dump_recon(out_dir, "post", test_post.recon)
    artifacts.dump_recon(out_dir, "prior", test_prior.recon)

    # 200-draw sample bands over the full val fold
    from structured_latent_odes_tpu.data.loader import full_batch

    fb = {k: jax.device_put(v) for k, v in full_batch(splits["val"]).items()}
    _, _, reconstruct = eval_fns
    for tag, is_post in (("post", True), ("prior", False)):
        k_samp, sub = jax.random.split(k_samp)
        bands = multiple_samples(
            reconstruct, best["params"], sub, fb, config.num_samples, is_post
        )
        artifacts.dump_sample_bands(out_dir, tag, bands["mu_25"], bands["mu_50"], bands["mu_75"])

    if config.get("plot", True):
        for tag, stats in (("post", test_post), ("prior", test_prior)):
            plotting.plot_label_grid(
                out_dir,
                f"test_{best['epoch']}_{tag}",
                stats.observations,
                stats.recon,
                times,
                {"symptoms": stats.labels["symptoms"], "shedding": stats.labels["shedding"]},
                CHANNELS,
            )
    checkpoint.save(
        os.path.join(out_dir, "best_model.npz"),
        best["params"],
        metadata={"epoch": best["epoch"], "criterion": float(best["criterion"])},
    )

    final = (
        "FINAL TEST: shedding_acc=(%.4f,%.4f)  symptoms_acc=(%.4f,%.4f) l1=(%.6f,%.6f)"
        % (
            test_post.label_metrics["shedding"],
            test_prior.label_metrics["shedding"],
            test_post.label_metrics["symptoms"],
            test_prior.label_metrics["symptoms"],
            test_post.l1,
            test_prior.l1,
        )
    )
    print(final)
    log.debug(final)
    return {"best": best, "test_post": test_post, "test_prior": test_prior}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", choices=["Mechanistic", "MechanisticGauss"], default=None)
    p.add_argument("--num-epochs", type=int, default=None)
    p.add_argument("--aux-mult-final", type=float, default=None,
                   help="anneal the aux multiplier to this value")
    p.add_argument("--aux-anneal-epochs", type=int, default=None,
                   help="epochs over which to anneal the aux multiplier")
    p.add_argument("--aux-mult-start", type=float, default=None,
                   help="warm the aux multiplier up from this value")
    p.add_argument("--aux-warmup-epochs", type=int, default=None,
                   help="epochs over which to warm the aux multiplier up")
    p.add_argument("--prior-lr-mult", type=float, default=None,
                   help="conditional-prior net learning-rate multiplier "
                        "(>1 keeps p(z_u|u) tracking the posterior)")
    p.add_argument("--lr-final", type=float, default=None,
                   help="linear lr decay target (with --lr-decay-start)")
    p.add_argument("--lr-decay-start", type=int, default=None,
                   help="epoch at which linear lr decay begins")
    p.add_argument("--prior-refit-epochs", type=int, default=None,
                   help="after training, refit ONLY the conditional-prior "
                        "nets on the main ELBO for R epochs (posterior "
                        "untouched)")
    p.add_argument("--aux-loss-multiplier", type=float, default=None,
                   help="aux classifier site scale (reference: 46; 460 "
                        "reliably disentangles subtle inputs, see PARITY.md)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--mini-batch-size", type=int, default=None)
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--optimizer", choices=["shared", "split"], default=None,
                   help="shared per-param Adam (Pyro parity) or two split Adams")
    p.add_argument("--data-parallel", type=int, default=None,
                   help="shard the batch over an N-device jax.sharding mesh")
    p.add_argument("--time-parallel", type=int, default=None,
                   help="shard the ODE horizon over K mesh time-shards "
                        "(sequence parallelism; forces the semilinear_timepar "
                        "backend)")
    p.add_argument("--data-seed", type=int, default=None,
                   help="fold-split seed (defaults to --seed; set to pin the "
                        "fold while varying training randomness)")
    p.add_argument("--split", type=int, default=None, help="fold 1..5")
    p.add_argument("--num-samples", type=int, default=None)
    p.add_argument("--ode-backend", default=None)
    p.add_argument("--num-particles", type=int, default=None,
                   help="ELBO particles averaged per step (Trace_ELBO(num_particles))")
    p.add_argument("--ode-rtol", type=float, default=None)
    p.add_argument("--ode-atol", type=float, default=None)
    p.add_argument("--data-path", default=None)
    p.add_argument("--results-root", default=".")
    p.add_argument("--no-plot", action="store_true")
    p.add_argument("--eval-every", type=int, default=1,
                   help="evaluate val/train stats every N epochs (faster)")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="persist full training state every N epochs")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler device trace of one epoch")
    p.add_argument("--resume", action="store_true",
                   help="resume from results_<Model>/train_state.npz")
    p.add_argument("--no-eval-train", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    config = load_challenge_config()
    for k, v in vars(args).items():
        k2 = k.replace("-", "_")
        if v is not None and k2 in config:
            config[k2] = v
    if args.num_epochs is not None:
        config.num_epochs = args.num_epochs
    config.results_root = args.results_root
    config.plot = not args.no_plot
    config.eval_train_stats = not args.no_eval_train
    config.eval_every = args.eval_every
    config.aux_mult_final = args.aux_mult_final
    config.aux_anneal_epochs = args.aux_anneal_epochs
    config.aux_mult_start = args.aux_mult_start
    config.aux_warmup_epochs = args.aux_warmup_epochs
    config.prior_refit_epochs = args.prior_refit_epochs
    config.data_seed = args.data_seed
    config.lr_final = args.lr_final
    config.lr_decay_start = args.lr_decay_start
    config.checkpoint_every = args.checkpoint_every
    config.resume = args.resume
    config.profile_dir = args.profile_dir

    out_dir = artifacts.results_dir(config.model, config.results_root)
    from structured_latent_odes_tpu.training_cvs import setup_logging

    setup_logging(out_dir)
    return train(config)


if __name__ == "__main__":
    main()
