"""Constant-twist deskew: p0 = Exp(alpha * xi)^{-1} ⊙ p per point.

Reference operators/deskew_constant_twist.py:32-117. alpha is the per-point
phase in the scan window (no hard clipping — soft time-membership weights
handle the boundary). The warp runs in POINT_DTYPE (f32): 8192 points of
small trig — pure VPU work that XLA fuses into one kernel.
"""

from __future__ import annotations

from typing import Tuple

from gcslam_tpu.utils.xla import jnp, POINT_DTYPE
from gcslam_tpu import constants as C
from gcslam_tpu.ops import se3
from gcslam_tpu.ops.certs import Cert, make_cert
from gcslam_tpu.ops.windows import smooth_window_weights


def deskew_constant_twist(
    points: jnp.ndarray,  # (N, 3)
    timestamps: jnp.ndarray,  # (N,)
    weights: jnp.ndarray,  # (N,)
    scan_start_time: jnp.ndarray,
    scan_end_time: jnp.ndarray,
    xi_body: jnp.ndarray,  # (6,) twist over the full scan interval
    ess_imu: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, Cert]:
    denom = jnp.maximum(scan_end_time - scan_start_time, 1e-12)
    alpha = ((timestamps - scan_start_time) / denom).astype(POINT_DTYPE)

    xi = xi_body.astype(POINT_DTYPE)
    # T(alpha) = Exp(alpha xi); apply inverse: p0 = R(a)^T (p - t(a)).
    # Batched over points: se3.se3_exp broadcasts over the leading axis.
    T_a = se3.se3_exp(alpha[:, None] * xi[None, :])  # (N, 6)
    R = se3.so3_exp(T_a[:, 3:6])  # (N, 3, 3)
    p0 = jnp.einsum("nji,nj->ni", R, points.astype(POINT_DTYPE) - T_a[:, :3])

    sigma = C.TIME_WARP_SIGMA_FRAC * denom
    w_time = smooth_window_weights(timestamps, scan_start_time, scan_end_time, sigma)
    weights_out = (weights * w_time).astype(POINT_DTYPE)

    retained = jnp.sum(weights_out) / (jnp.sum(weights) + C.EPS_MASS)
    cert = make_cert(exact=True, ess_total=ess_imu, support_frac=retained)
    return p0, weights_out, cert
