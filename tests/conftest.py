"""Test config: force an 8-device virtual CPU mesh so tests run locally and
sharding tests work without TPU hardware.

The container's sitecustomize registers a remote-TPU (axon) PJRT backend in
every Python process and pins JAX_PLATFORMS=axon, so plain env vars are not
enough — we must override via jax.config BEFORE the first backend init.
"""

import os

# Never enable the persistent compile cache under pytest: a large compile's
# cache write (zstandard) can crash under end-of-suite memory pressure, and
# tests must not depend on cross-run on-disk state anyway.
os.environ["GCSLAM_JAX_CACHE_DISABLE"] = "1"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import gcslam_tpu  # noqa: E402,F401  (enables x64 before any test builds arrays)
