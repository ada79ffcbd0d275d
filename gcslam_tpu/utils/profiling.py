"""Tracing / profiling utilities — the runtime-counters analog.

The reference counts host<->device bytes, host syncs, and JIT recompiles via
global Python counters (common/runtime_counters.py) because its pipeline is
Python-dispatched. Here a scan is ONE program, so the equivalents are:

  - StepTimer: wall per-step timing with explicit block_until_ready (the
    enable_timing path);
  - compile_count(): XLA compilation-cache size delta (the
    jit_recompile_count assertion — a stable pipeline compiles each config
    exactly once);
  - trace(): context manager around jax.profiler for xprof traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import List

import jax


class StepTimer:
    def __init__(self):
        self.ms: List[float] = []

    @contextlib.contextmanager
    def measure(self, out_ref=None):
        t0 = time.perf_counter()
        yield
        if out_ref is not None:
            jax.block_until_ready(out_ref)
        self.ms.append((time.perf_counter() - t0) * 1000.0)

    def summary(self) -> dict:
        if not self.ms:
            return {}
        import numpy as np

        a = np.asarray(self.ms)
        return {
            "n": len(a),
            "mean_ms": float(a.mean()),
            "p50_ms": float(np.percentile(a, 50)),
            "p95_ms": float(np.percentile(a, 95)),
            "max_ms": float(a.max()),
        }


def compile_count() -> int:
    """Number of entries in jit caches (proxy for recompiles)."""
    from jax._src import pjit  # noqa: PLC0415

    try:
        return int(pjit._cpp_pjit_cache_fun_only.currsize)  # type: ignore[attr-defined]
    except Exception:
        return -1


def device_runtime_cert(batches, n_host_syncs: int = 1) -> dict:
    """Numeric DeviceRuntimeCert (reference certificates.py:298-316 +
    common/runtime_counters.py): host->device bytes actually shipped this
    run, host-sync count, and the jit-cache size (recompile proxy — a
    stable pipeline compiles each config exactly once)."""
    h2d = 0
    for b in batches:
        for leaf in jax.tree_util.tree_leaves(b):
            h2d += getattr(leaf, "nbytes", 0)
    return {
        "h2d_bytes": int(h2d),
        "n_batches": len(batches),
        "host_syncs": int(n_host_syncs),
        "jit_cache_entries": compile_count(),
    }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
