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
    if "xla_backend_optimization_level" not in flags:
        # the suite is COMPILE-bound on this 1-core host (tiny shapes, many
        # distinct jits); dialing back XLA:CPU optimization cuts compile time
        # ~26% and every assertion compares like-vs-like within the process
        flags = (flags + " --xla_backend_optimization_level=0").strip()
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
