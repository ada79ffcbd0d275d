"""Test config: force an 8-device virtual CPU mesh so tests run locally and
sharding tests work without TPU hardware.

The container's sitecustomize registers a remote-TPU (axon) PJRT backend in
every Python process and pins JAX_PLATFORMS=axon, so plain env vars are not
enough — we must override via jax.config BEFORE the first backend init.
"""

import os

# Keep the PRODUCTION cache dir (.jax_cache) out of tests — eval.run must
# not mix test-budget entries into the TPU cache. Tests get their own
# persistent cache below (tests/.jax_test_cache).
os.environ["GCSLAM_JAX_CACHE_DISABLE"] = "1"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# This box has ONE CPU: XLA's parallel LLVM codegen (default split count 32)
# spawns a thread storm per compile, and with several pytest processes
# compiling at once it segfaulted the CPU compiler three rounds in a row.
# One codegen thread per compile is strictly safer here and not measurably
# slower on a single core.
if "xla_cpu_parallel_codegen_split_count" not in flags:
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for TESTS (VERDICT r4 #10: the 59-min suite spent
# most wall-clock recompiling the same small-budget pipelines in every
# fresh per-file process). Safe now because the canonical lane runs one
# file per process (tests/run_suite.py) — the round-2 cache-write segfault
# happened under end-of-suite memory pressure in ONE long-lived process.
# GCSLAM_TEST_NO_CACHE=1 opts out.
if os.environ.get("GCSLAM_TEST_NO_CACHE") != "1":
    _cache_dir = os.path.join(os.path.dirname(__file__), ".jax_test_cache")
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import gcslam_tpu  # noqa: E402,F401  (enables x64 before any test builds arrays)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables after each test module.

    In one long-lived process the suite accumulates ~100 sizeable XLA CPU
    executables; that accumulation eventually segfaults
    backend_compile_and_load near the end of the suite (rounds 1-2). The
    canonical lane (tests/run_suite.py) isolates per file with fresh
    processes; this fixture protects plain ``pytest tests/`` runs too.
    Module-scoped so jitted functions stay cached WITHIN a file.
    """
    yield
    jax.clear_caches()
