"""Shared per-parameter Adam: exact parity with torch.optim.Adam under the
reference's dual-SVI update pattern (/root/reference/training_cvs.py:227,
238-249 — ONE pyro.optim.Adam stepped by BOTH losses; a shared parameter's
moments/step-count advance on every loss that touches it)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from structured_latent_odes_tpu.train.svi import shared_adam_init, shared_adam_update

LR = 1e-2


def _torch_dual_adam(params0, main_grads, aux_grads, main_mask, aux_mask, steps):
    """Pyro-style: one torch Adam slot set per param; per loss, only params
    with grads step (grad=None params are skipped entirely by torch)."""
    tparams = {k: torch.tensor(np.asarray(v), requires_grad=True) for k, v in params0.items()}
    opt = torch.optim.Adam(list(tparams.values()), lr=LR, betas=(0.9, 0.999), eps=1e-8)
    for i in range(steps):
        for grads, mask in ((main_grads, main_mask), (aux_grads, aux_mask)):
            opt.zero_grad(set_to_none=True)
            for k, p in tparams.items():
                if mask[k]:
                    p.grad = torch.tensor(np.asarray(grads[k](i)))
            opt.step()
    return {k: p.detach().numpy() for k, p in tparams.items()}


@pytest.mark.slow
def test_shared_adam_matches_torch_dual_loss():
    rng = np.random.RandomState(0)
    params0 = {
        "enc": rng.randn(3, 2).astype(np.float32),  # shared by both losses
        "dec": rng.randn(4).astype(np.float32),  # main only
        "aux": rng.randn(2).astype(np.float32),  # aux only
    }
    main_mask = {"enc": True, "dec": True, "aux": False}
    aux_mask = {"enc": True, "dec": False, "aux": True}
    # deterministic pseudo-grad streams, different per loss
    main_grads = {k: (lambda i, k=k: (np.sin(i + len(k)) * np.ones_like(params0[k])).astype(np.float32)) for k in params0}
    aux_grads = {k: (lambda i, k=k: (np.cos(2 * i + len(k)) * np.ones_like(params0[k])).astype(np.float32)) for k in params0}

    steps = 7
    expected = _torch_dual_adam(params0, main_grads, aux_grads, main_mask, aux_mask, steps)

    params = {k: jnp.asarray(v) for k, v in params0.items()}
    slots = shared_adam_init(params)
    for i in range(steps):
        g_main = {k: jnp.asarray(main_grads[k](i)) for k in params}
        params, slots = shared_adam_update(g_main, slots, params, main_mask, LR)
        g_aux = {k: jnp.asarray(aux_grads[k](i)) for k in params}
        params, slots = shared_adam_update(g_aux, slots, params, aux_mask, LR)

    for k in params0:
        np.testing.assert_allclose(np.asarray(params[k]), expected[k], rtol=1e-5, atol=1e-6)

    # shared param stepped by both losses; exclusive params by one each
    assert int(slots.count["enc"]) == 2 * steps
    assert int(slots.count["dec"]) == steps
    assert int(slots.count["aux"]) == steps
    # untouched slots stay exactly zero for masked-out params' moments
    np.testing.assert_array_equal(np.asarray(slots.mu["dec"] != 0).any(), True)


def test_masked_out_leaves_untouched():
    params = {"a": jnp.ones(3), "b": jnp.ones(3)}
    slots = shared_adam_init(params)
    grads = {"a": jnp.full((3,), 0.5), "b": jnp.full((3,), 0.5)}
    new_params, new_slots = shared_adam_update(
        grads, slots, params, {"a": True, "b": False}, LR
    )
    np.testing.assert_array_equal(np.asarray(new_params["b"]), np.ones(3))
    np.testing.assert_array_equal(np.asarray(new_slots.mu["b"]), np.zeros(3))
    assert int(new_slots.count["b"]) == 0
    assert int(new_slots.count["a"]) == 1
    assert not np.allclose(np.asarray(new_params["a"]), np.ones(3))


@pytest.mark.slow
def test_split_vs_shared_differ_on_shared_params():
    """Sanity: the two optimizer modes genuinely differ for a parameter
    receiving both gradient streams (this is the round-1 deviation)."""
    from structured_latent_odes_tpu.data.configs import load_cvs_config
    from structured_latent_odes_tpu.models import cvs_spec, init_params
    from structured_latent_odes_tpu.train.svi import make_train_step

    config = load_cvs_config()
    config.seq_len = 16
    spec = cvs_spec(config, n_time=16)
    params = init_params(jax.random.key(0), spec)
    rng = np.random.RandomState(1)
    batch = {
        "observations": jnp.asarray(rng.rand(4, 3, 16), jnp.float32),
        "iext": jnp.asarray((rng.rand(4, 1) > 0.5).astype(np.float32)),
        "rtpr": jnp.asarray((rng.rand(4, 1) > 0.5).astype(np.float32)),
        "mask": jnp.ones((4,), jnp.float32),
    }
    ts = jnp.arange(16.0)
    results = {}
    for mode in ("shared", "split"):
        init_state, train_step, _ = make_train_step(spec, ts, 1e-2, params, optimizer=mode)
        # train_step donates its input state; give each mode its own buffers
        state = init_state(jax.tree.map(jnp.copy, params), jax.random.key(2))
        for _ in range(3):
            state, _m = train_step(state, batch)
        results[mode] = state.params
    enc_shared = jax.tree.leaves(results["shared"]["encoder"])[0]
    enc_split = jax.tree.leaves(results["split"]["encoder"])[0]
    assert not np.allclose(np.asarray(enc_shared), np.asarray(enc_split))


@pytest.mark.slow
def test_prior_lr_mult_scales_only_prior_updates():
    """prior_lr_mult must change ONLY the conditional-prior nets' update —
    encoder/decoder/aux updates stay bit-identical (the knob is scoped to the
    'priors' group in the main loss)."""
    from structured_latent_odes_tpu.data.configs import load_cvs_config
    from structured_latent_odes_tpu.models import cvs_spec, init_params
    from structured_latent_odes_tpu.train.svi import make_train_step

    T, B = 16, 6
    config = load_cvs_config()
    config.seq_len = T
    spec = cvs_spec(config, n_time=T)
    params = init_params(jax.random.key(0), spec)
    r = np.random.RandomState(2)
    batch = {
        "observations": jnp.asarray(r.rand(B, 3, T).astype(np.float32)),
        "iext": jnp.asarray((r.rand(B, 1) > 0.5).astype(np.float32)),
        "rtpr": jnp.asarray((r.rand(B, 1) > 0.5).astype(np.float32)),
        "mask": jnp.ones((B,), jnp.float32),
    }
    ts = jnp.arange(float(T))

    out = {}
    for mult in (1.0, 8.0):
        init_state, step, _ = make_train_step(
            spec, ts, LR, params, prior_lr_mult=mult
        )
        state = init_state(jax.tree.map(jnp.copy, params), jax.random.key(5))
        state, _m = step(state, batch)
        out[mult] = jax.tree.map(np.asarray, state.params)

    for group in ("encoder", "decoder", "aux", "aux_std"):
        for a, b in zip(
            jax.tree.leaves(out[1.0][group]), jax.tree.leaves(out[8.0][group])
        ):
            np.testing.assert_array_equal(a, b)
    diffs = [
        float(np.abs(a - b).max())
        for a, b in zip(
            jax.tree.leaves(out[1.0]["priors"]), jax.tree.leaves(out[8.0]["priors"])
        )
    ]
    assert max(diffs) > 0, "prior updates did not change with prior_lr_mult"


def test_aux_mult_schedule_warmup_and_anneal():
    """Warm-up + anneal schedule endpoints, and ensemble/driver parity."""
    from structured_latent_odes_tpu.data.configs import load_cvs_config
    from structured_latent_odes_tpu.train.driver import epoch_aux_mult
    from structured_latent_odes_tpu.train.ensemble import aux_mult_schedule

    config = load_cvs_config()
    config.aux_loss_multiplier = 46.0
    config.aux_mult_start = 0.0
    config.aux_warmup_epochs = 4
    config.aux_mult_final = 10.0
    config.aux_anneal_epochs = 8
    sched = aux_mult_schedule(config, num_epochs=16)
    # sequential composition: warm 0->46 over [0,4], then 46->10 over [4,12]
    assert sched[0] == 0.0
    np.testing.assert_allclose(sched[2], 23.0)
    np.testing.assert_allclose(sched[4], 46.0)  # warm-up peaks at base
    np.testing.assert_allclose(sched[8], 46.0 * 0.5 + 10.0 * 0.5)
    np.testing.assert_allclose(sched[12:], 10.0)
    for e in range(17):
        np.testing.assert_allclose(sched[e], epoch_aux_mult(config, e), rtol=1e-6)

    # single-knob behaviors unchanged (the headline recipes)
    warm = load_cvs_config()
    warm.aux_loss_multiplier = 460.0
    warm.aux_mult_start = 46.0
    warm.aux_warmup_epochs = 4
    warm.aux_mult_final = None
    warm.aux_anneal_epochs = None
    np.testing.assert_allclose(
        aux_mult_schedule(warm, 6)[[0, 2, 4, 6]], [46.0, 253.0, 460.0, 460.0]
    )
    ann = load_cvs_config()
    ann.aux_loss_multiplier = 460.0
    ann.aux_mult_start = None
    ann.aux_warmup_epochs = None
    ann.aux_mult_final = 46.0
    ann.aux_anneal_epochs = 4
    np.testing.assert_allclose(
        aux_mult_schedule(ann, 6)[[0, 2, 4, 6]], [460.0, 253.0, 46.0, 46.0]
    )

    # no schedule configured -> driver returns None, ensemble uses the base
    config2 = load_cvs_config()
    config2.aux_mult_start = None
    config2.aux_warmup_epochs = None
    config2.aux_mult_final = None
    config2.aux_anneal_epochs = None
    assert epoch_aux_mult(config2, 3) is None
    np.testing.assert_allclose(
        aux_mult_schedule(config2, 2), config2.aux_loss_multiplier
    )


@pytest.mark.slow
def test_lr_scale_schedule_semantics():
    """epoch_lr_scale formula + batch-threaded lr_scale: scale 0 freezes the
    parameters (moments still advance, torch-scheduler-style); the schedule
    is constant until lr_decay_start then linear to lr_final."""
    from structured_latent_odes_tpu.data.configs import load_cvs_config
    from structured_latent_odes_tpu.models import cvs_spec, init_params
    from structured_latent_odes_tpu.train.driver import epoch_lr_scale
    from structured_latent_odes_tpu.train.ensemble import lr_scale_schedule
    from structured_latent_odes_tpu.train.svi import make_train_step

    config = load_cvs_config()
    config.num_epochs = 10
    config.lr_final = 1e-4
    config.lr_decay_start = 5
    assert epoch_lr_scale(config, 0) == 1.0
    assert epoch_lr_scale(config, 5) == 1.0
    np.testing.assert_allclose(epoch_lr_scale(config, 10), 0.1)
    sched = lr_scale_schedule(config, 10)
    np.testing.assert_allclose(sched[:6], 1.0)
    np.testing.assert_allclose(sched[10], 0.1)
    config.lr_final = None
    assert epoch_lr_scale(config, 3) is None
    assert lr_scale_schedule(config, 10) is None

    T, B = 16, 4
    config2 = load_cvs_config()
    config2.seq_len = T
    spec = cvs_spec(config2, n_time=T)
    params = init_params(jax.random.key(0), spec)
    r = np.random.RandomState(2)
    batch = {
        "observations": jnp.asarray(r.rand(B, 3, T).astype(np.float32)),
        "iext": jnp.asarray((r.rand(B, 1) > 0.5).astype(np.float32)),
        "rtpr": jnp.asarray((r.rand(B, 1) > 0.5).astype(np.float32)),
        "mask": jnp.ones((B,), jnp.float32),
        "lr_scale": jnp.asarray(0.0),
    }
    ts = jnp.arange(float(T))
    init_state, step, _ = make_train_step(spec, ts, LR, params)
    state = init_state(jax.tree.map(jnp.copy, params), jax.random.key(5))
    state, _m = step(state, batch)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
