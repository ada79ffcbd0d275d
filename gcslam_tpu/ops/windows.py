"""Soft time-membership windows (reference operators/imu_preintegration.py:20-43).

w(t) = sigmoid((t - start)/sigma) * sigmoid((end - t)/sigma), floored to a
strictly positive continuous weight — no hard [t0, t1] boundaries anywhere.
"""

from __future__ import annotations

from gcslam_tpu.utils.xla import jax, jnp, BELIEF_DTYPE
from gcslam_tpu import constants as C


def smooth_window_weights(
    stamps: jnp.ndarray,
    start: jnp.ndarray,
    end: jnp.ndarray,
    sigma: jnp.ndarray,
) -> jnp.ndarray:
    sig = jnp.maximum(jnp.asarray(sigma, dtype=stamps.dtype), 1e-6)
    a = (stamps - start) / sig
    b = (end - stamps) / sig
    w_raw = jax.nn.sigmoid(a) * jax.nn.sigmoid(b)
    wf = jnp.asarray(C.WEIGHT_FLOOR, dtype=stamps.dtype)
    # stamps are TIME_DTYPE (f64 absolute); the weights are O(1) — return
    # them in the belief compute dtype so f32-belief mode stays f32.
    return (w_raw * (1.0 - wf) + wf).astype(BELIEF_DTYPE)
