"""The step-builder memos: identical structural args must return the SAME
jitted objects (no re-trace/re-compile); any differing knob must miss.

Pins the behavior added for sweep resumes / multi-test sessions in
train/svi.py::_TRAIN_STEP_MEMO, parallel/train.py::_DP_STEP_MEMO and
train/ensemble.py::_RUNNER_MEMO. Build-only — nothing here compiles, so
this lives in the fast tier.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structured_latent_odes_tpu.data.configs import load_cvs_config
from structured_latent_odes_tpu.models import cvs_spec, init_params
from structured_latent_odes_tpu.train.ensemble import make_ensemble_runner
from structured_latent_odes_tpu.train.svi import make_train_step

T = 16


@pytest.fixture(scope="module")
def spec_params():
    config = load_cvs_config()
    config.seq_len = T
    spec = cvs_spec(config, n_time=T)
    return spec, init_params(jax.random.key(0), spec)


def test_train_step_memo_identity(spec_params):
    spec, params = spec_params
    ts = jnp.arange(float(T))
    a = make_train_step(spec, ts, 1e-3, params)
    b = make_train_step(spec, ts, 1e-3, params)
    assert a[1] is b[1] and a[2] is b[2]
    # equal ts VALUES (same dtype) from a different array object still hit
    c = make_train_step(spec, np.arange(T, dtype=np.float32), 1e-3, params)
    assert c[1] is a[1]
    # a different dtype is a different trace -> miss
    c64 = make_train_step(spec, np.arange(T, dtype=np.float64), 1e-3, params)
    assert c64[1] is not a[1]
    # any differing knob misses
    d = make_train_step(spec, ts, 2e-3, params)
    assert d[1] is not a[1]
    e = make_train_step(spec, jnp.arange(float(T)) * 2.0, 1e-3, params)
    assert e[1] is not a[1]


def test_ensemble_runner_memo_identity(spec_params):
    spec, params = spec_params
    ts = jnp.arange(float(T))
    a = make_ensemble_runner(spec, ts, 1e-3, params, policy="cvs")
    b = make_ensemble_runner(spec, ts, 1e-3, params, policy="cvs")
    assert a.run is b.run and a.run_chunk is b.run_chunk
    for kw in (
        {"policy": "challenge"},
        {"policy": "cvs", "shared_data": True},
        {"policy": "cvs", "prior_lr_mult": 5.0},
        {"policy": "cvs", "optimizer": "split"},
    ):
        other = make_ensemble_runner(spec, ts, 1e-3, params, **kw)
        assert other.run is not a.run, f"{kw} must not hit the memo"


def test_memo_bounded_lru_eviction(spec_params):
    """The builder memos are bounded LRUs: walking a knob grid larger than
    the capacity evicts oldest-used entries (freeing their compiled
    executables) instead of growing for process lifetime (ADVICE r4; the
    vm.max_map_count exhaustion history in conftest.py / commit ee2c923).
    Recently-used entries survive, so the hot path still hits.
    """
    from structured_latent_odes_tpu.train.svi import _TRAIN_STEP_MEMO
    from structured_latent_odes_tpu.utils.memo import BoundedMemo

    spec, params = spec_params
    ts = jnp.arange(float(T))
    _TRAIN_STEP_MEMO.clear()
    cap = _TRAIN_STEP_MEMO.maxsize
    a = make_train_step(spec, ts, 1e-3, params)
    for i in range(cap):  # cap distinct recipes, touching the first each time
        make_train_step(spec, ts, 1e-3 + 1e-6 * (i + 1), params)
        make_train_step(spec, ts, 1e-3, params)
    assert len(_TRAIN_STEP_MEMO) == cap
    assert make_train_step(spec, ts, 1e-3, params)[1] is a[1]  # kept (LRU)
    # the least-recently-used grid point was evicted -> fresh objects
    b = make_train_step(spec, ts, 1e-3 + 1e-6, params)
    assert len(_TRAIN_STEP_MEMO) == cap

    m = BoundedMemo(maxsize=2)
    m["a"], m["b"] = 1, 2
    assert m.get("a") == 1  # touch 'a' so 'b' is LRU
    m["c"] = 3
    assert "b" not in m and m.get("a") == 1 and m.get("c") == 3


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_step_memo_keys_on_mesh(spec_params):
    from structured_latent_odes_tpu.parallel.mesh import make_mesh
    from structured_latent_odes_tpu.parallel.train import make_dp_train_step

    spec, params = spec_params
    ts = jnp.arange(float(T))
    mesh = make_mesh()
    a = make_dp_train_step(spec, ts, 1e-3, params, mesh)
    # a NEW Mesh object over the same devices/axes is the same structural key
    mesh_again = jax.sharding.Mesh(mesh.devices, mesh.axis_names)
    b = make_dp_train_step(spec, ts, 1e-3, params, mesh_again)
    assert a[1] is b[1]
    # a different device subset misses
    sub = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("data",))
    c = make_dp_train_step(spec, ts, 1e-3, params, sub)
    assert c[1] is not a[1]
