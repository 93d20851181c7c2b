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
        # Persistent executable cache: repeat suite runs skip XLA codegen
        # entirely (a 10.6s mesh-step compile drops to 0.3s warm). The dir is
        # keyed by this host's CPU feature set: XLA:CPU AOT executables are
        # machine-specific, and loading entries written on a different host
        # logs "could lead to execution errors such as SIGILL" and misses
        # anyway (observed round 4 — a cache carried across driver hosts made
        # the whole slow tier recompile cold every run while risking crashes).
        import hashlib

        try:
            with open("/proc/cpuinfo") as f:
                lines = f.readlines()
            # flags ALONE collide across CPU models whose feature strings
            # match but whose LLVM target tuning differs (round 5: a cache
            # written under identical flags on a different model spammed
            # "machine type ... doesn't match" AOT-load errors and missed) —
            # include the model name in the key
            cpu_id = "".join(
                next((ln for ln in lines if ln.startswith(p)), "")
                for p in ("flags", "model name")
            )
            host_key = hashlib.sha256(cpu_id.encode()).hexdigest()[:12]
        except OSError:
            host_key = "nohost"
        env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f".jax_test_cache_{host_key}",
        )
        # cache every program, not just >=1s compiles: init/eval paths are
        # many sub-second compiles that add up across 44 slow tests
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    env["SLODE_TEST_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not _NEEDS_REEXEC:
    import jax

    jax.config.update("jax_enable_x64", False)

    # NOTE (round 4): multi-device persistent-cache WRITES are re-enabled.
    # Round 3 skipped them because executable.serialize() abort()ed on the
    # big 8-device programs late in long sessions — that abort is now
    # attributed to vm.max_map_count exhaustion (fixed by the per-module
    # executable release below), and the mesh tests are the tier's dominant
    # compile cost, so caching them is the single biggest warm-run win.
    # If the abort ever recurs, restore the put_executable_and_time filter
    # from git history (ee2c923^..) rather than disabling the cache.

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
        from structured_latent_odes_tpu.parallel import train as _ptrain
        from structured_latent_odes_tpu.train import ensemble as _ens
        from structured_latent_odes_tpu.train import svi as _svi

        _svi._TRAIN_STEP_MEMO.clear()
        _svi._EVAL_EPOCH_MEMO.clear()
        _svi._EVAL_FNS_MEMO.clear()
        _ptrain._DP_STEP_MEMO.clear()
        _ens._RUNNER_MEMO.clear()
        jax.clear_caches()
        gc.collect()
