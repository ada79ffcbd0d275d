"""ScanBatch: one scan's fixed-shape sensor inputs (the typed-pytree
replacement for the reference's ROS topics /gc/sensors/*).

Every field has a static shape set by the budgets; validity is encoded in
weights/masks, never in shapes. A whole bag is a stacked ScanBatch with a
leading time axis, ready for lax.scan or host-prefetched streaming.

Field provenance (reference backend_node.py:1651-2035 per-scan assembly):
  - LiDAR: parse_pointcloud2_vlp16 output padded to N_POINTS_CAP
  - IMU: ring-buffer window slice zero-padded to MAX_IMU_PREINT_LEN
  - odom: closest-to-scan message (identity + 1e12 cov when missing)
  - camera: MeasurementBatch camera slice (zeros when with_camera=False)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from gcslam_tpu.utils.xla import jnp, BELIEF_DTYPE, POINT_DTYPE, TIME_DTYPE
from gcslam_tpu import constants as C


class ScanBatch(NamedTuple):
    # LiDAR (POINT_DTYPE; padded rows carry zero weight)
    points: jnp.ndarray  # (N_POINTS_CAP, 3) in base frame
    point_stamps: jnp.ndarray  # (N_POINTS_CAP,)
    point_weights: jnp.ndarray  # (N_POINTS_CAP,)
    point_ring: jnp.ndarray  # (N_POINTS_CAP,) int32
    point_tag: jnp.ndarray  # (N_POINTS_CAP,) int32

    # IMU window (stamps TIME_DTYPE f64; zero-padded stamps mark invalid)
    imu_stamps: jnp.ndarray  # (MAX_IMU_PREINT_LEN,)
    imu_gyro: jnp.ndarray  # (MAX_IMU_PREINT_LEN, 3)
    imu_accel: jnp.ndarray  # (MAX_IMU_PREINT_LEN, 3)

    # Odometry (closest to scan)
    odom_pose: jnp.ndarray  # (6,) [trans, rotvec]
    odom_cov: jnp.ndarray  # (6, 6)
    odom_twist: jnp.ndarray  # (6,) [v(3), omega(3)] body frame
    odom_twist_cov: jnp.ndarray  # (6, 6)
    # Relative odometry (odom_{k-1}^{-1} o odom_k): wheel odometry is a
    # RELATIVE sensor; the absolute-pose factor (reference
    # odom_evidence.py:87-154) anchors the filter to the odom frame's
    # accumulated drift. config.odom_pose_mode selects which factor runs.
    odom_rel_pose: jnp.ndarray  # (6,)
    odom_rel_cov: jnp.ndarray  # (6, 6)

    # Camera measurement slice (zeros unless with_camera)
    cam_Lambdas: jnp.ndarray  # (N_FEAT, 3, 3)
    cam_thetas: jnp.ndarray  # (N_FEAT, 3)
    cam_etas: jnp.ndarray  # (N_FEAT, VMF_N_LOBES, 3)
    cam_weights: jnp.ndarray  # (N_FEAT,)
    cam_colors: jnp.ndarray  # (N_FEAT, 3)
    cam_valid: jnp.ndarray  # (N_FEAT,) bool

    # Loop closure (LoopFactor contract, reference msg/LoopFactor.msg +
    # spec 6.12: late anchor-relative pose evidence with budgeted
    # recomposition — never iterative optimization). loop_weight=0 => absent.
    loop_pose: jnp.ndarray  # (6,) world-frame pose measurement
    loop_cov: jnp.ndarray  # (6, 6)
    loop_weight: jnp.ndarray  # () continuous validity in [0, 1]

    # Scan clock (absolute stamps TIME_DTYPE f64; dt_sec is a small
    # difference and lives in BELIEF_DTYPE)
    scan_start_time: jnp.ndarray  # ()
    scan_end_time: jnp.ndarray  # ()
    t_scan: jnp.ndarray  # ()
    t_last_scan: jnp.ndarray  # ()
    dt_sec: jnp.ndarray  # ()
    scan_seq: jnp.ndarray  # () int32


def empty_scan_batch(
    n_points: int = C.N_POINTS_CAP,
    n_imu: int = C.MAX_IMU_PREINT_LEN,
    n_feat: int = C.N_FEAT,
) -> ScanBatch:
    """All-zero batch: one zero-weight dummy scan (graceful-degradation shape,
    reference backend_node.py:1700-1707)."""
    f = BELIEF_DTYPE
    t = TIME_DTYPE
    return ScanBatch(
        points=jnp.zeros((n_points, 3), dtype=POINT_DTYPE),
        point_stamps=jnp.zeros((n_points,), dtype=t),
        point_weights=jnp.zeros((n_points,), dtype=POINT_DTYPE),
        point_ring=jnp.zeros((n_points,), dtype=jnp.int32),
        point_tag=jnp.zeros((n_points,), dtype=jnp.int32),
        imu_stamps=jnp.zeros((n_imu,), dtype=t),
        imu_gyro=jnp.zeros((n_imu, 3), dtype=f),
        imu_accel=jnp.zeros((n_imu, 3), dtype=f),
        odom_pose=jnp.zeros((6,), dtype=f),
        odom_cov=1e12 * jnp.eye(6, dtype=f),
        odom_twist=jnp.zeros((6,), dtype=f),
        odom_twist_cov=jnp.eye(6, dtype=f),
        odom_rel_pose=jnp.zeros((6,), dtype=f),
        odom_rel_cov=1e12 * jnp.eye(6, dtype=f),
        cam_Lambdas=jnp.zeros((n_feat, 3, 3), dtype=f),
        cam_thetas=jnp.zeros((n_feat, 3), dtype=f),
        cam_etas=jnp.zeros((n_feat, C.VMF_N_LOBES, 3), dtype=f),
        cam_weights=jnp.zeros((n_feat,), dtype=f),
        cam_colors=jnp.zeros((n_feat, 3), dtype=f),
        cam_valid=jnp.zeros((n_feat,), dtype=bool),
        loop_pose=jnp.zeros((6,), dtype=f),
        loop_cov=1e12 * jnp.eye(6, dtype=f),
        loop_weight=jnp.zeros((), dtype=f),
        scan_start_time=jnp.zeros((), dtype=t),
        scan_end_time=jnp.zeros((), dtype=t),
        t_scan=jnp.zeros((), dtype=t),
        t_last_scan=jnp.zeros((), dtype=t),
        dt_sec=jnp.zeros((), dtype=f),
        scan_seq=jnp.zeros((), dtype=jnp.int32),
    )


def stack_scan_batches(batches: list) -> ScanBatch:
    """Stack a python list of ScanBatch into one with a leading time axis."""
    return ScanBatch(*[jnp.stack([getattr(b, f) for b in batches]) for f in ScanBatch._fields])


def range_weights(dist: np.ndarray) -> np.ndarray:
    """Continuous range-based point weights (backend_node.py:443-460)."""
    a = (dist - C.RANGE_WEIGHT_MIN_R) / C.RANGE_WEIGHT_SIGMA
    b = (C.RANGE_WEIGHT_MAX_R - dist) / C.RANGE_WEIGHT_SIGMA
    w = (1.0 / (1.0 + np.exp(-a))) * (1.0 / (1.0 + np.exp(-b)))
    return w * (1.0 - C.WEIGHT_FLOOR) + C.WEIGHT_FLOOR
