"""Generic SLODE model tests: spec wiring, ELBO behavior, masking, eval fns."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structured_latent_odes_tpu.data.configs import (
    load_challenge_config,
    load_cvs_config,
    load_proc_config,
)
from structured_latent_odes_tpu.models import (
    challenge_spec,
    classifier,
    cvs_spec,
    elbo_aux,
    elbo_main,
    init_params,
    param_masks,
    proc_spec,
    recon,
)
from structured_latent_odes_tpu.train.svi import make_eval_fns, make_train_step


def _tiny_cvs_spec():
    config = load_cvs_config()
    config.seq_len = 20
    return cvs_spec(config, n_time=20), config


def _cvs_batch(B=6, T=20, key=0):
    rng = np.random.RandomState(key)
    return {
        "observations": jnp.asarray(rng.rand(B, 3, T).astype(np.float32)),
        "iext": jnp.asarray((rng.rand(B, 1) > 0.5).astype(np.float32)),
        "rtpr": jnp.asarray((rng.rand(B, 1) > 0.5).astype(np.float32)),
        "mask": jnp.ones((B,), dtype=jnp.float32),
    }


def test_spec_dims():
    spec, _ = _tiny_cvs_spec()
    assert spec.latent_dim == 15
    assert spec.z_u_dim == 10
    assert spec.block_slice("rtpr") == slice(5, 10)
    c = load_proc_config()
    ps = proc_spec(c, n_time=30)
    assert ps.latent_dim == 50 and ps.z_u_dim == 40 and ps.label_input_dim == 9
    ch = challenge_spec(load_challenge_config(), n_time=25)
    assert ch.latent_dim == 15 and ch.z_u_dim == 10 and ch.label_input_dim == 2


@pytest.mark.slow
@pytest.mark.parametrize("dataset", ["cvs", "proc", "challenge"])
@pytest.mark.parametrize("model", ["Mechanistic", "MechanisticGauss"])
def test_all_six_models_run(dataset, model):
    """All six reference model graphs instantiate, evaluate and differentiate."""
    T = 16
    if dataset == "cvs":
        config = load_cvs_config()
        config.model = model
        spec = cvs_spec(config, n_time=T)
        batch = _cvs_batch(4, T)
    elif dataset == "proc":
        config = load_proc_config()
        config.model = model
        spec = proc_spec(config, n_time=T)
        rng = np.random.RandomState(0)
        batch = {
            "observations": jnp.asarray(rng.rand(4, 4, T).astype(np.float32)),
            "aR": jax.nn.one_hot(jnp.asarray([0, 1, 2, 0]), 3),
            "aS": jax.nn.one_hot(jnp.asarray([0, 1, 2, 3]), 4),
            "C12": jnp.asarray(rng.rand(4, 1).astype(np.float32)),
            "C6": jnp.asarray(rng.rand(4, 1).astype(np.float32)),
            "mask": jnp.ones((4,), dtype=jnp.float32),
        }
    else:
        config = load_challenge_config()
        config.model = model
        spec = challenge_spec(config, n_time=T)
        rng = np.random.RandomState(0)
        batch = {
            "observations": jnp.asarray(rng.rand(4, 4, T).astype(np.float32)),
            "shedding": jnp.asarray((rng.rand(4, 1) > 0.5).astype(np.float32)),
            "symptoms": jnp.asarray((rng.rand(4, 1) > 0.5).astype(np.float32)),
            "mask": jnp.ones((4,), dtype=jnp.float32),
        }

    ts = jnp.arange(float(T))
    params = init_params(jax.random.key(0), spec)
    key = jax.random.key(1)

    loss, mets = elbo_main(spec, params, key, batch, ts)
    assert np.isfinite(loss) and np.isfinite(mets["l1"])
    loss_a = elbo_aux(spec, params, key, batch)
    assert np.isfinite(loss_a)

    g = jax.grad(lambda p: elbo_main(spec, p, key, batch, ts)[0])(params)
    gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0

    preds = classifier(spec, params, key, batch["observations"])
    for label in spec.labels:
        assert preds[label.name].shape == batch[label.name].shape

    r = recon(spec, params, key, batch, ts, is_post=True)
    assert r["mu_50"].shape == batch["observations"].shape
    r2 = recon(spec, params, key, batch, ts, is_post=False)
    assert r2["z"].shape == (4, spec.latent_dim)


@pytest.mark.slow
def test_padding_mask_invariance():
    """A padded batch produces EXACTLY the unpadded loss (and recon), because
    every draw is keyed per-sample (prob.sample_normal_ps) — batch size and
    padding cannot perturb a sample's RNG stream."""
    spec, _ = _tiny_cvs_spec()
    params = init_params(jax.random.key(0), spec)
    ts = jnp.arange(20.0)
    batch = _cvs_batch(6)
    key = jax.random.key(3)
    loss_ref, mets_ref = elbo_main(spec, params, key, batch, ts)
    aux_ref = elbo_aux(spec, params, key, batch)
    r_ref = recon(spec, params, key, batch, ts, is_post=True)

    padded = {
        k: jnp.concatenate([v, jnp.zeros((3,) + v.shape[1:], v.dtype)]) for k, v in batch.items()
    }
    padded["mask"] = jnp.concatenate([jnp.ones(6), jnp.zeros(3)])
    loss_pad, _ = elbo_main(spec, params, key, padded, ts)
    aux_pad = elbo_aux(spec, params, key, padded)
    r_pad = recon(spec, params, key, padded, ts, is_post=True)
    np.testing.assert_allclose(loss_pad, loss_ref, rtol=1e-6)
    np.testing.assert_allclose(aux_pad, aux_ref, rtol=1e-6)
    np.testing.assert_allclose(r_pad["mu_50"][:6], r_ref["mu_50"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(r_pad["z"][:6], r_ref["z"], rtol=1e-5, atol=1e-6)

    # and the padded *content* is inert (changing it is a no-op on the loss)
    padded2 = dict(padded)
    padded2["observations"] = padded["observations"].at[6:].set(123.0)
    loss_pad2, _ = elbo_main(spec, params, key, padded2, ts)
    np.testing.assert_allclose(loss_pad2, loss_ref, rtol=1e-6)


@pytest.mark.slow
def test_batch_size_independent_eval_draws():
    """With explicit sample_id, a sample's recon is identical whether it is
    evaluated in one big batch or in a 2-batch split (sample_normal_ps)."""
    spec, _ = _tiny_cvs_spec()
    params = init_params(jax.random.key(0), spec)
    ts = jnp.arange(20.0)
    key = jax.random.key(7)
    big = _cvs_batch(6)
    big["sample_id"] = jnp.arange(6, dtype=jnp.int32)
    r_big = recon(spec, params, key, big, ts, is_post=True)
    lo = {k: v[:3] for k, v in big.items()}
    hi = {k: v[3:] for k, v in big.items()}
    r_lo = recon(spec, params, key, lo, ts, is_post=True)
    r_hi = recon(spec, params, key, hi, ts, is_post=True)
    np.testing.assert_allclose(
        np.concatenate([r_lo["z"], r_hi["z"]]), np.asarray(r_big["z"]), rtol=1e-5, atol=1e-6
    )


def test_mask_parity_exact_same_shapes():
    """With equal shapes and key, mask=0 rows contribute nothing."""
    spec, _ = _tiny_cvs_spec()
    params = init_params(jax.random.key(0), spec)
    ts = jnp.arange(20.0)
    key = jax.random.key(4)
    batch = _cvs_batch(6)
    m = np.ones(6, dtype=np.float32)
    m[4:] = 0
    batch_masked = dict(batch, mask=jnp.asarray(m))
    l_all, _ = elbo_main(spec, params, key, batch, ts)
    l_masked, _ = elbo_main(spec, params, key, batch_masked, ts)
    assert not np.allclose(l_all, l_masked)  # fewer samples -> different sum


def test_param_masks_structure():
    spec, _ = _tiny_cvs_spec()
    params = init_params(jax.random.key(0), spec)
    main, aux = param_masks(spec, params)
    assert jax.tree.all(jax.tree.map(lambda x: x is True, main["encoder"]))
    assert jax.tree.all(jax.tree.map(lambda x: x is False, aux["decoder"]))
    # CVS scores aux heads only in the aux loss
    assert jax.tree.all(jax.tree.map(lambda x: x is False, main["aux"]))


@pytest.mark.slow
def test_train_step_reduces_loss():
    """A few SVI steps on a fixed batch must reduce the main loss."""
    spec, config = _tiny_cvs_spec()
    params = init_params(jax.random.key(0), spec)
    ts = jnp.arange(20.0)
    init_state, train_step, _ = make_train_step(spec, ts, 1e-2, params)
    state = init_state(params, jax.random.key(5))
    batch = _cvs_batch(8)
    losses = []
    for _ in range(30):
        state, mets = train_step(state, batch)
        losses.append(float(mets["loss_main"]))
    assert losses[-1] < losses[0], losses[:3] + losses[-3:]


def test_eval_fns_run():
    spec, _ = _tiny_cvs_spec()
    params = init_params(jax.random.key(0), spec)
    ts = jnp.arange(20.0)
    evaluate_losses, classify, reconstruct = make_eval_fns(spec, ts)
    batch = _cvs_batch(5)
    lm, la = evaluate_losses(params, jax.random.key(0), batch)
    assert np.isfinite(lm) and np.isfinite(la)
    p = classify(params, jax.random.key(1), batch)
    assert set(p) == {"iext", "rtpr"}
    r = reconstruct(params, jax.random.key(2), batch, True)
    assert np.isfinite(float(r["l1"]))


@pytest.mark.slow
def test_aux_mult_override_matches_spec_constant():
    """batch['aux_mult'] == spec constant must reproduce the same losses."""
    spec, _ = _tiny_cvs_spec()
    params = init_params(jax.random.key(0), spec)
    ts = jnp.arange(20.0)
    key = jax.random.key(11)
    batch = _cvs_batch(5)
    l_ref, _ = elbo_main(spec, params, key, batch, ts)
    a_ref = elbo_aux(spec, params, key, batch)
    batch2 = dict(batch, aux_mult=jnp.asarray(spec.aux_loss_multiplier))
    l_ovr, _ = elbo_main(spec, params, key, batch2, ts)
    a_ovr = elbo_aux(spec, params, key, batch2)
    assert np.allclose(l_ref, l_ovr) and np.allclose(a_ref, a_ovr)
    # and a different multiplier changes the aux loss but not the latent part
    batch3 = dict(batch, aux_mult=jnp.asarray(10 * spec.aux_loss_multiplier))
    a_big = elbo_aux(spec, params, key, batch3)
    assert not np.allclose(a_ref, a_big)


def test_init_params_fast_matches_eager():
    """The one-compile initializer is numerically identical to the eager one
    (same traced ops, same keys) — it exists because eager init costs ~1s/op
    over a remote-tunnel backend."""
    from structured_latent_odes_tpu.data.configs import load_cvs_config
    from structured_latent_odes_tpu.models import cvs_spec, init_params, init_params_fast

    config = load_cvs_config()
    config.seq_len = 16
    spec = cvs_spec(config, n_time=16)
    key = jax.random.key(3)
    a = init_params(key, spec)
    b = init_params_fast(key, spec)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        # jit fuses the scale/shift arithmetic differently -> ~1e-10 f32
        # wobble; same draws, same distribution
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-9
        )


def test_init_state_does_not_alias_caller_params():
    """train_step/train_epoch DONATE the state, so init_state must deep-copy
    the caller's params: without the copy, the first donated dispatch frees
    the caller's buffers and a second init_state from the same params feeds
    deleted arrays to the device (opaque INVALID_ARGUMENT on the axon TPU
    backend, where repeated bench/multi-state usage first exposed it)."""
    spec, _ = _tiny_cvs_spec()
    params = init_params(jax.random.key(0), spec)
    ts = jnp.arange(20.0)
    init_state, train_step, _ = make_train_step(spec, ts, 1e-2, params)
    state = init_state(params, jax.random.key(5))
    # simulate the donation: explicitly delete every caller-side param buffer
    for leaf in jax.tree.leaves(params):
        leaf.delete()
    # the state must remain fully usable — one SVI step end-to-end
    batch = _cvs_batch(4)
    state, mets = train_step(state, batch)
    assert np.isfinite(float(mets["loss_main"]))
