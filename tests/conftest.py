"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding/pjit tests use XLA's
host-platform device virtualization instead (SURVEY.md §4).

The harness environment pre-registers a remote-TPU PJRT plugin via
``sitecustomize`` *before* any conftest runs (``JAX_PLATFORMS=axon``), and the
backend is already initialized by the time pytest imports this file — so every
test would compile over the TPU tunnel. Environment tweaks here are too late;
instead we re-exec the interpreter once with a clean CPU environment (after
restoring pytest's captured stdio so output still reaches the terminal).
"""

import os
import sys

_NEEDS_REEXEC = (
    os.environ.get("SLODE_TEST_REEXEC") != "1"
    and os.environ.get("JAX_PLATFORMS", "") != "cpu"
)


def pytest_configure(config):
    if not _NEEDS_REEXEC:
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # disable remote-TPU plugin registration
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # NOTE: do NOT add --xla_backend_optimization_level=0 here. It cut
    # compile time ~26%, but XLA:CPU deterministically segfaults with it in
    # long many-compile sessions (the slow tier died at the same test in two
    # consecutive runs — once inside executable.serialize(), once inside
    # backend_compile_and_load; both vanish without the flag). The
    # persistent cache below is the supported compile-time lever.
    env["XLA_FLAGS"] = flags
    if "JAX_COMPILATION_CACHE_DIR" not in env:
        # persistent executable cache (~1.6 MB per heavy program): repeat
        # suite runs skip XLA codegen entirely — a slow-tier ensemble test
        # drops 40s -> 22s warm. Cold first runs are unaffected.
        env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_test_cache",
        )
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    env["SLODE_TEST_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not _NEEDS_REEXEC:
    import jax

    jax.config.update("jax_enable_x64", False)

    # XLA:CPU's executable.serialize() abort()s on the BIG multi-(virtual-)
    # device programs late in a long many-compile session (the slow tier died
    # three times in put_executable_and_time on the 8-device epoch-scan /
    # driver executables; the same entries serialize fine from a fresh
    # process). Skip persistent-cache WRITES for multi-device executables —
    # reads still hit entries seeded by shorter sessions, and the
    # single-device programs (the bulk of the compile time) cache normally.
    from jax._src import compilation_cache as _cc

    _orig_put = _cc.put_executable_and_time

    def _single_device_only_put(cache_key, module_name, executable, backend,
                                compile_time):
        try:
            if len(executable.local_devices()) > 1:
                return
        except Exception:
            return
        return _orig_put(cache_key, module_name, executable, backend,
                         compile_time)

    _cc.put_executable_and_time = _single_device_only_put

    # Long many-compile sessions exhaust the kernel's vm.max_map_count
    # (65530 here): every live compiled executable holds JIT code pages and
    # buffer mappings, and nothing frees them across 40+ heavy tests — the
    # process was measured at ~2k new maps per test, segfaulting inside
    # XLA:CPU compile/serialize right at the limit (~31 tests in). Dropping
    # every executable after each test FILE bounds the live set; the
    # persistent cache makes the cross-file recompiles cheap deserializes.
    import gc

    import pytest

    @pytest.fixture(autouse=True, scope="module")
    def _release_compiled_executables():
        yield
        from structured_latent_odes_tpu.train import svi as _svi

        _svi._TRAIN_STEP_MEMO.clear()
        _svi._EVAL_EPOCH_MEMO.clear()
        _svi._EVAL_FNS_MEMO.clear()
        jax.clear_caches()
        gc.collect()
