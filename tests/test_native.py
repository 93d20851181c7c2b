"""C++ native runtime tests: golden parity vs the pure-Python paths."""

import numpy as np
import pytest

from structured_latent_odes_tpu import native
from structured_latent_odes_tpu.data import proc
from structured_latent_odes_tpu.data.configs import load_proc_config

needs_native = pytest.mark.skipif(native.lib() is None, reason="native lib unavailable")


@needs_native
def test_native_csv_parse_matches_pandas():
    config = load_proc_config()
    import os

    for fname in config.data.files[:2]:
        path = os.path.join(config.data_path, fname)
        n_dev, n_treat, n_times, n_obs = native.parse_proc_csv_native(
            path, config.data.devices, config.data.conditions, config.data.signals
        )
        p_dev, p_treat, p_times, p_obs = proc.parse_file(path, config.data, use_native=False)
        assert np.array_equal(n_dev, p_dev)
        assert np.allclose(n_treat, p_treat)
        assert np.allclose(n_times, p_times)
        assert np.allclose(n_obs, p_obs)


@needs_native
def test_native_pack_epoch():
    src = np.arange(24, dtype=np.float32).reshape(6, 4)
    perm = np.array([3, 1, 5, -1], dtype=np.int32)
    out = native.pack_epoch_native(src, perm, 4)
    assert np.array_equal(out[0], src[3])
    assert np.array_equal(out[1], src[1])
    assert np.array_equal(out[2], src[5])
    assert np.array_equal(out[3], np.zeros(4))


@needs_native
def test_full_pipeline_native_equals_python():
    """build_splits with native parser == forced-pandas parse_file output."""
    config = load_proc_config()
    splits, times = proc.build_splits(config)
    assert splits["train"]["observations"].shape == (234, 4, 100)
    # spot-check one file parses equal through both paths (covered above);
    # end shape equality is the integration check here
    assert len(times) == 100
