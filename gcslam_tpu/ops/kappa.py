"""vMF concentration from resultant length — single continuous blend.

Math identical to the reference (fl_slam_poc/backend/operators/kappa.py:932-1017):
    k_low  = R (d - R^2) / (1 - R^2 + eps)      (low-R Taylor)
    k_high = -log(max(1 - R^2, eps))            (high-R log barrier)
    kappa  = (1 - s) k_low + s k_high,  s = sigmoid((R - R0)/tau)

Conservative (under-estimates kappa at high R) and branch-free. Batched.
"""

from __future__ import annotations

from typing import Tuple

from gcslam_tpu.utils.xla import jax, jnp
from gcslam_tpu import constants as C


def kappa_from_resultant(
    R_bar: jnp.ndarray,
    d: float = 3.0,
    eps_r: float = C.EPS_R,
    r0: float = C.KAPPA_BLEND_R0,
    tau: float = C.KAPPA_BLEND_TAU,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (kappa, clamp_delta); works on any-shape arrays."""
    R = jnp.asarray(R_bar)
    R_clamped = jnp.clip(R, 0.0, 1.0 - eps_r)
    clamp_delta = jnp.abs(R_clamped - R)
    R2 = R_clamped * R_clamped
    k_low = R_clamped * (d - R2) / (1.0 - R2 + eps_r)
    k_high = -jnp.log(jnp.maximum(1.0 - R2, eps_r))
    s = jax.nn.sigmoid((R_clamped - r0) / max(tau, 1e-6))
    return (1.0 - s) * k_low + s * k_high, clamp_delta
