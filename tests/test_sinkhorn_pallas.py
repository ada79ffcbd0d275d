"""The fused Pallas Sinkhorn must reproduce the XLA loop bit-for-bit in
math terms (same iteration, same guards) — interpreted on CPU here, compiled
on TPU in production (ops/sinkhorn_pallas.py)."""

import numpy as np

from gcslam_tpu.utils.xla import jnp
from gcslam_tpu.ops.association import _sinkhorn_unbalanced
from gcslam_tpu.ops.sinkhorn_pallas import sinkhorn_unbalanced_pallas


def _case(N, K, seed=0):
    rng = np.random.default_rng(seed)
    C = rng.uniform(0.0, 5.0, size=(N, K)).astype(np.float32)
    # a third of the rows invalid (zero mass), like masked measurements
    valid = rng.uniform(size=N) > 0.33
    a = valid.astype(np.float32)
    a = a / max(a.sum(), 1e-9)
    b = np.full((K,), 1.0 / K, dtype=np.float32)
    return jnp.asarray(C), jnp.asarray(a), jnp.asarray(b)


def test_matches_xla_loop():
    for N, K in [(128, 8), (257, 8), (1024, 8)]:
        C, a, b = _case(N, K, seed=N)
        ref = _sinkhorn_unbalanced(C, a, b, 0.05, 1.0, 1.0, 50)
        out = sinkhorn_unbalanced_pallas(C, a, b, 0.05, 1.0, 1.0, 50,
                                         interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=1e-7)


def test_zero_mass_rows_stay_zero():
    C, a, b = _case(256, 8, seed=7)
    a = a.at[:100].set(0.0)
    out = sinkhorn_unbalanced_pallas(C, a, b, 0.05, 1.0, 1.0, 50,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out)[:100], 0.0, atol=0.0)
    assert np.all(np.isfinite(np.asarray(out)))
