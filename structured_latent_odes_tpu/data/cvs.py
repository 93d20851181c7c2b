"""Synthetic cardiovascular-system (CVS) dataset.

Re-implements the reference generator (/root/reference/data/cvs/cvs_data.py)
TPU-natively: the 4-state mechanistic ODE is written in JAX and all 1000
trajectories integrate in ONE vmapped fixed-step RK4 solve on device (the
reference loops scipy.integrate.odeint per trajectory). A numpy RHS mirror is
kept for scipy oracle tests.

States: normalized (p_a/100, p_v/10, s, sv/100); observations (p_a, p_v, f_hr).
Interventions: i_ext ∈ {0, -2}, r_tpr_mod ∈ {0, 0.5} drawn per trajectory
(cvs_data.py:24-27); binarized labels iext>=0, rtpr>0 at load time
(ODE_dataset.py:50-51).
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from structured_latent_odes_tpu.data.transforms import find_norm_params
from structured_latent_odes_tpu.ode import odeint

Array = jax.Array

# Fixed physiological parameters (cvs_data.py:29-48); i_ext / r_tpr_mod vary.
CVS_PARAMS = {
    "f_hr_max": 3.0,
    "f_hr_min": 2.0 / 3.0,
    "r_tpr_max": 2.134,
    "r_tpr_min": 0.5335,
    "sv_mod": 0.0001,
    "ca": 4.0,
    "cv": 111.0,
    "k_width": 0.1838,
    "p_aset": 70.0,
    "tau": 20.0,
}


def cvs_rhs(t, state, i_ext, r_tpr_mod, np_mod=jnp):
    """Mechanistic RHS d(state)/dt; works with jnp (device) or np (oracle).

    state: (..., 4) normalized [p_a/100, p_v/10, s, sv/100].
    """
    p = CVS_PARAMS
    p_a = 100.0 * state[..., 0]
    p_v = 10.0 * state[..., 1]
    s = state[..., 2]
    sv = 100.0 * state[..., 3]

    f_hr = s * (p["f_hr_max"] - p["f_hr_min"]) + p["f_hr_min"]
    r_tpr = s * (p["r_tpr_max"] - p["r_tpr_min"]) + p["r_tpr_min"] - r_tpr_mod

    dva_dt = -1.0 * (p_a - p_v) / r_tpr + sv * f_hr
    dvv_dt = -1.0 * dva_dt + i_ext
    dpa_dt = dva_dt / (p["ca"] * 100.0)
    dpv_dt = dvv_dt / (p["cv"] * 10.0)
    ds_dt = (1.0 / p["tau"]) * (
        1.0 - 1.0 / (1.0 + np_mod.exp(-p["k_width"] * (p_a - p["p_aset"]))) - s
    )
    dsv_dt = i_ext * p["sv_mod"]
    return np_mod.stack([dpa_dt, dpv_dt, ds_dt, dsv_dt], axis=-1)


def states_to_observations(states: np.ndarray) -> np.ndarray:
    """(.., T, 4) states -> (.., T, 3) observations (p_a_norm, p_v_norm, f_hr)."""
    p = CVS_PARAMS
    f_hr = states[..., 2] * (p["f_hr_max"] - p["f_hr_min"]) + p["f_hr_min"]
    return np.stack([states[..., 0], states[..., 1], f_hr], axis=-1)


def simulate_batch(
    i_ext: Array, r_tpr_mod: Array, seq_len: int = 86, delta_t: float = 1.0, substeps: int = 10
) -> Array:
    """Integrate a whole batch of CVS systems on device in one solve.

    Returns states (B, T, 4). Uses RK4 on a ``substeps``-refined grid (the
    system is mildly stiff through the baroreflex sigmoid; dt=0.1 RK4 matches
    scipy LSODA to ~1e-5 — tested in tests/test_data_cvs.py).
    """
    B = i_ext.shape[0]
    x0 = jnp.ones((B, 4))
    ts_fine = jnp.arange(0.0, (seq_len - 1) * delta_t + delta_t / substeps, delta_t / substeps)

    def f_batch(t, y):
        return cvs_rhs(t, y, i_ext, r_tpr_mod, np_mod=jnp)

    sol = odeint(f_batch, x0, ts_fine, method="rk4")  # (T_fine, B, 4)
    return jnp.moveaxis(sol[::substeps], 0, 1)  # (B, T, 4)


def make_dataset(
    output_dir: str,
    data_size: int = 1000,
    seq_len: int = 86,
    delta_t: float = 1.0,
    noise_std: float = 0.05,
    seed: int = 12,
) -> str:
    """Generate and persist the CVS dataset (reference ``make_dataset``,
    cvs_data.py:142-183: 90/10 train/test split, obs noise, norm params,
    ground-truth latents/params kept for exact-recovery checks)."""
    rng = np.random.RandomState(seed)
    i_ext = np.where(rng.rand(data_size) > 0.5, 0.0, -2.0).astype(np.float32)
    r_tpr_mod = np.where(rng.rand(data_size) > 0.5, 0.0, 0.5).astype(np.float32)

    states = np.asarray(
        jax.jit(simulate_batch, static_argnums=(2, 3, 4))(
            jnp.asarray(i_ext), jnp.asarray(r_tpr_mod), seq_len, delta_t
        )
    )  # (N, T, 4)
    raw = states_to_observations(states)  # (N, T, 3)

    buffer = int(round(data_size * 0.9))
    train_clean, test_clean = raw[:buffer], raw[buffer:]
    noisy_train = train_clean + noise_std * rng.standard_normal(train_clean.shape)
    noisy_test = test_clean + noise_std * rng.standard_normal(test_clean.shape)

    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "cvs.npz")
    norm_params = find_norm_params(noisy_train)
    np.savez(
        path,
        train_obs=noisy_train.astype(np.float32),
        test_obs=noisy_test.astype(np.float32),
        gt_test_obs=test_clean.astype(np.float32),
        train_latent=states[:buffer].astype(np.float32),
        test_latent=states[buffer:].astype(np.float32),
        train_iext=i_ext[:buffer],
        train_rtpr=r_tpr_mod[:buffer],
        test_iext=i_ext[buffer:],
        test_rtpr=r_tpr_mod[buffer:],
        **{f"norm_{k}": v for k, v in norm_params.items()},
    )
    return path


def load_reference_pickles(data_dir: str) -> Dict[str, np.ndarray]:
    """Load the reference's torch-saved pickles (processed_data.pkl etc.) for
    parity evaluation against the upstream-generated data."""
    import torch

    obs = torch.load(os.path.join(data_dir, "processed_data.pkl"), weights_only=False)
    train_params = torch.load(os.path.join(data_dir, "train_params_data.pkl"), weights_only=False)
    test_params = torch.load(os.path.join(data_dir, "test_params_data.pkl"), weights_only=False)
    out = {
        "train_obs": np.asarray(obs["train"], dtype=np.float32),
        "test_obs": np.asarray(obs["test"], dtype=np.float32),
        "train_iext": np.asarray(train_params["i_ext"], dtype=np.float32),
        "train_rtpr": np.asarray(train_params["r_tpr_mod"], dtype=np.float32),
        "test_iext": np.asarray(test_params["i_ext"], dtype=np.float32),
        "test_rtpr": np.asarray(test_params["r_tpr_mod"], dtype=np.float32),
    }
    norm_path = os.path.join(data_dir, "data_norm_params.pkl")
    if os.path.exists(norm_path):
        # prefer the authors' saved normalization constants (cvs_data.py:176)
        norm = torch.load(norm_path, weights_only=False)
        out["norm_params"] = {k: np.asarray(v, dtype=np.float32) for k, v in norm.items()}
    return out


def load_splits(config, reference_dir: str | None = None):
    """Build train/val/test splits with binarized labels and norm params.

    Train pickle is further split 90/10 into train/val (ODE_dataset.py:19-38).
    Returns (splits, norm_params) where each split is a dict of numpy arrays
    with observations (N, T, K) and labels (N, 1).
    """
    if reference_dir is not None:
        d = load_reference_pickles(reference_dir)
        norm_params = d.get("norm_params") or find_norm_params(d["train_obs"])
    else:
        path = os.path.join(config.data_path, "cvs.npz")
        if not os.path.exists(path):
            print(f"CVS dataset not found at {path} — generating on device...")
            make_dataset(
                config.data_path,
                data_size=config.data_size,
                seq_len=config.seq_len,
                delta_t=config.delta_t,
                noise_std=config.get("noise_std", 0.05),
                seed=config.seed,
            )
        z = np.load(path)
        d = {k: z[k] for k in z.files}
        norm_params = {k[len("norm_") :]: d[k] for k in list(d) if k.startswith("norm_")}

    buffer = int(round(d["train_obs"].shape[0] * 0.9))

    def pack(obs, iext, rtpr):
        return {
            "observations": obs.astype(np.float32),
            "iext": (iext >= 0).astype(np.float32)[:, None],
            "rtpr": (rtpr > 0).astype(np.float32)[:, None],
        }

    splits = {
        "train": pack(d["train_obs"][:buffer], d["train_iext"][:buffer], d["train_rtpr"][:buffer]),
        "val": pack(d["train_obs"][buffer:], d["train_iext"][buffer:], d["train_rtpr"][buffer:]),
        "test": pack(d["test_obs"], d["test_iext"], d["test_rtpr"]),
    }
    return splits, norm_params
