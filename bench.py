"""Benchmark: CVS ELBO training steps/sec on TPU vs a PyTorch-CPU baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The headline metric is full dual-loss SVI steps/sec on the flagship CVS
workload (B=128, T=86, the reference's production configuration,
/root/reference/data/cvs/config_cvs.py). ``vs_baseline`` divides by an
embedded PyTorch-CPU implementation of the same step — conv encoder, prior
MLPs, sequential-midpoint neural-ODE decode (the torchdiffeq fixed-grid
algorithm), quantile-Laplace ELBO, backward, two Adam updates — i.e. the
reference's hot path without Pyro's tracing overhead (a conservative
baseline: the real reference is slower).

Also measured (reported in "extra"): batched semilinear ODE solves/sec/chip.
"""

import json
import time

import numpy as np


def bench_tpu(batch=128, n_time=86, iters=30, warmup=3):
    import jax
    import jax.numpy as jnp

    from structured_latent_odes_tpu.data.configs import load_cvs_config
    from structured_latent_odes_tpu.models import cvs_spec, init_params
    from structured_latent_odes_tpu.nn.ode_model import ode_model_init, solve_ode
    from structured_latent_odes_tpu.train.svi import make_train_step

    config = load_cvs_config()
    spec = cvs_spec(config, n_time=n_time)
    params = init_params(jax.random.key(0), spec)
    rng = np.random.RandomState(0)
    batch_d = {
        "observations": jnp.asarray(rng.rand(batch, 3, n_time), dtype=jnp.float32),
        "iext": jnp.asarray((rng.rand(batch, 1) > 0.5).astype(np.float32)),
        "rtpr": jnp.asarray((rng.rand(batch, 1) > 0.5).astype(np.float32)),
        "mask": jnp.ones((batch,), dtype=jnp.float32),
    }
    ts = jnp.arange(float(n_time))
    init_state, train_step, train_epoch = make_train_step(
        spec, ts, config.learning_rate, params
    )
    state = init_state(params, jax.random.key(1))

    # per-step path (host dispatch per minibatch)
    for _ in range(warmup):
        state, mets = train_step(state, batch_d)
    jax.block_until_ready(mets["loss_main"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, mets = train_step(state, batch_d)
    jax.block_until_ready(mets["loss_main"])
    per_step_sps = iters / (time.perf_counter() - t0)

    # epoch-scan path (the drivers' default: whole epoch in one dispatch)
    n_batches = 16
    stacked = {
        k: jnp.broadcast_to(v, (n_batches,) + v.shape) for k, v in batch_d.items()
    }
    state, mets = train_epoch(state, stacked)
    jax.block_until_ready(mets["loss_main"])
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        state, mets = train_epoch(state, stacked)
    jax.block_until_ready(mets["loss_main"])
    steps_per_sec = reps * n_batches / (time.perf_counter() - t0)

    # secondary: batched ODE solves/sec (trajectories integrated per second)
    B2 = 4096
    ode_spec = spec.decoder.ode
    ode_params = ode_model_init(jax.random.key(2), ode_spec)
    z = jax.random.normal(jax.random.key(3), (B2, spec.latent_dim))
    solve = jax.jit(lambda p, z: solve_ode(ode_spec, p, z, ts))
    sol = solve(ode_params, z)
    jax.block_until_ready(sol)
    t0 = time.perf_counter()
    for _ in range(10):
        sol = solve(ode_params, z)
    jax.block_until_ready(sol)
    solves_per_sec = 10 * B2 / (time.perf_counter() - t0)

    device = str(jax.devices()[0])
    return steps_per_sec, per_step_sps, solves_per_sec, device


def bench_torch_baseline(batch=128, n_time=86, iters=5):
    """The same training step in idiomatic PyTorch on CPU."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    latent, state_dim, hidden = 15, 5, 25

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv1d(3, 10, 10)
            self.pool = nn.AvgPool1d(5, stride=1)
            flat = (n_time - 9 - 4) * 10
            self.lin = nn.Linear(flat, 50)
            self.loc = nn.Linear(50, latent)
            self.scale = nn.Linear(50, latent)

        def forward(self, x):
            h = self.pool(self.conv(x)).flatten(1)
            h = torch.tanh(self.lin(h))
            return self.loc(h), torch.exp(self.scale(h))

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc = Encoder()
            self.lat2state = nn.Sequential(
                nn.Linear(latent, hidden), nn.ReLU(), nn.Linear(hidden, state_dim), nn.Sigmoid()
            )
            self.dyn_hidden = nn.Linear(latent + 1, hidden)
            self.prod = nn.Linear(hidden, state_dim)
            self.degr = nn.Linear(hidden, state_dim)
            self.heads = nn.ModuleList([nn.Linear(state_dim, 3, bias=False) for _ in range(3)])
            self.prior_iext = nn.ModuleList([nn.Linear(1, 5), nn.Linear(1, 5)])
            self.prior_rtpr = nn.ModuleList([nn.Linear(1, 5), nn.Linear(1, 5)])
            self.log_std = nn.Parameter(torch.full((3, n_time), 1e-2))

        def dynamics(self, t, x, z):
            inp = torch.cat([t.expand(z.shape[0], 1), z], dim=1)
            h = torch.relu(self.dyn_hidden(inp))
            return torch.sigmoid(self.prod(h)) - torch.sigmoid(self.degr(h)) * x

        def forward(self, obs, iext, rtpr):
            loc, scale = self.enc(obs)
            z = loc + scale * torch.randn_like(loc)
            # sequential fixed-grid midpoint (torchdiffeq's algorithm)
            x = self.lat2state(z)
            sol = [x]
            for k in range(n_time - 1):
                t0 = torch.tensor(float(k))
                k1 = self.dynamics(t0, x, z)
                k2 = self.dynamics(t0 + 0.5, x + 0.5 * k1, z)
                x = x + k2
                sol.append(x)
            sol = torch.stack(sol, dim=1)  # (B, T, D)
            std = torch.nn.functional.softplus(self.log_std)
            elbo = 0.0
            for head, tau in zip(self.heads, (0.5, 0.975, 0.025)):
                mu = head(sol).permute(0, 2, 1)
                w = torch.where(obs >= mu, tau, 1 - tau)
                elbo = elbo + (w * (-(obs - mu).abs() / std - torch.log(2 * std))).sum()
            # latent KL terms vs conditional priors
            p_loc = torch.cat(
                [self.prior_iext[0](iext), self.prior_rtpr[0](rtpr), torch.zeros_like(loc[:, 10:])],
                dim=1,
            )
            p_scale = torch.cat(
                [
                    torch.exp(self.prior_iext[1](iext)),
                    torch.exp(self.prior_rtpr[1](rtpr)),
                    torch.ones_like(scale[:, 10:]),
                ],
                dim=1,
            )
            logp = -0.5 * ((z - p_loc) / p_scale) ** 2 - torch.log(p_scale)
            logq = -0.5 * ((z - loc) / scale) ** 2 - torch.log(scale)
            elbo = elbo + (logp - logq).sum()
            return -elbo

    model = Model()
    aux_heads = nn.Sequential(nn.Linear(5, 25), nn.Softplus(), nn.Linear(25, 1), nn.Sigmoid())
    opt = torch.optim.Adam(list(model.parameters()) + list(aux_heads.parameters()), lr=1e-3)
    obs = torch.rand(batch, 3, n_time)
    iext = (torch.rand(batch, 1) > 0.5).float()
    rtpr = (torch.rand(batch, 1) > 0.5).float()

    def step():
        opt.zero_grad()
        loss = model(obs, iext, rtpr)
        loss.backward()
        opt.step()
        # aux loss (second SVI step)
        opt.zero_grad()
        loc, scale = model.enc(obs)
        z = loc + scale * torch.randn_like(loc)
        alpha = aux_heads(z[:, :5]).clamp(1e-6, 1 - 1e-6)
        aux = -46.0 * (iext * alpha.log() + (1 - iext) * (1 - alpha).log()).sum()
        aux.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    return iters / (time.perf_counter() - t0)


def main():
    steps_per_sec, per_step_sps, solves_per_sec, device = bench_tpu()
    baseline = bench_torch_baseline()
    out = {
        "metric": "cvs_elbo_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / baseline, 2),
        "extra": {
            "torch_cpu_baseline_steps_per_sec": round(baseline, 3),
            "per_dispatch_steps_per_sec": round(per_step_sps, 3),
            "ode_solves_per_sec_per_chip": round(solves_per_sec, 1),
            "batch": 128,
            "seq_len": 86,
            "device": device,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
