"""Odometry + planar evidence factors on the 22D tangent.

Each factor returns (L (22,22), h (22,), Cert [, residuals]). All are pure
Gaussian information contributions; residuals use measurement-minus-
prediction so the MAP increment moves toward the measurement. Parity:

  - odom_quadratic_evidence: reference operators/odom_evidence.py:39-154
        r = Log(T_pred^{-1} ∘ T_odom) into the pose slice, L = Sigma^{-1}.
  - odom_velocity_evidence: operators/odom_twist_evidence.py:58-149
  - odom_yawrate_evidence: operators/odom_twist_evidence.py:157-228
  - pose_twist_kinematic_consistency: odom_twist_evidence.py:251-397
  - odom_dependence_inflation: odom_twist_evidence.py:400-430
  - planar_z_prior / velocity_z_prior: operators/planar_prior.py:209-349
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

from gcslam_tpu.utils.xla import jnp, BELIEF_DTYPE
from gcslam_tpu import constants as C
from gcslam_tpu.ops import linalg, se3
from gcslam_tpu.ops.certs import Cert, make_cert, TRIGGERS


def _embed(block: jnp.ndarray, vec: jnp.ndarray, sl: slice) -> Tuple[jnp.ndarray, jnp.ndarray]:
    L = jnp.zeros((C.D_Z, C.D_Z), dtype=BELIEF_DTYPE)
    h = jnp.zeros((C.D_Z,), dtype=BELIEF_DTYPE)
    L = L.at[sl, sl].set(block)
    h = h.at[sl].set(vec)
    return L, h


def odom_quadratic_evidence(
    pose_pred: jnp.ndarray,  # (6,) [trans, rotvec]
    odom_pose: jnp.ndarray,  # (6,)
    odom_cov: jnp.ndarray,  # (6, 6) in [trans, rot] order (matches chart)
    eps_psd: float = C.EPS_PSD,
    eps_lift: float = C.EPS_LIFT,
) -> Tuple[jnp.ndarray, jnp.ndarray, Cert]:
    T_err = se3.se3_relative(odom_pose, pose_pred)  # pred^{-1} ∘ odom
    r_pose = se3.se3_log(T_err)  # (6,) [rho, phi] == chart pose slice ordering

    cov_psd, _ = linalg.domain_projection_psd(odom_cov, eps_psd)
    L_pose, lift = linalg.spd_inverse_lifted(cov_psd, eps_lift)
    L, h = _embed(L_pose, L_pose @ r_pose, C.IDX_POSE)

    nll = 0.5 * r_pose @ L_pose @ r_pose
    L_psd, pc = linalg.domain_projection_psd(L_pose, eps_psd)
    cert = make_cert(
        exact=False,
        triggers=TRIGGERS["OdomEvidenceGaussian"],
        eig_min=pc.eig_min,
        eig_max=pc.eig_max,
        cond=pc.cond,
        near_null_count=pc.near_null_count,
        nll_per_ess=nll,
        lift_strength=lift,
    )
    return L, h, cert


def odom_velocity_evidence(
    v_pred_world: jnp.ndarray,  # (3,)
    R_world_body: jnp.ndarray,  # (3, 3)
    v_odom_body: jnp.ndarray,  # (3,)
    Sigma_v: jnp.ndarray,  # (3, 3)
    eps_psd: float = C.EPS_PSD,
    eps_lift: float = C.EPS_LIFT,
) -> Tuple[jnp.ndarray, jnp.ndarray, Cert, jnp.ndarray]:
    v_pred_body = R_world_body.T @ v_pred_world
    r_vel_body = v_odom_body - v_pred_body
    Sigma_psd, _ = linalg.domain_projection_psd(Sigma_v, eps_psd)
    L3_body, lift = linalg.spd_inverse_lifted(Sigma_psd, eps_lift)
    # The velocity tangent block is WORLD-frame (the preint factor and the
    # belief treat mu[6:9] as v_world), so transport the body-frame residual
    # and precision: r_w = R r_b, Lambda_w = R Lambda_b R^T. (The reference
    # embeds the body residual directly, odom_twist_evidence.py:100-117.)
    r_vel = R_world_body @ r_vel_body
    L3 = R_world_body @ L3_body @ R_world_body.T
    L, h = _embed(L3, L3 @ r_vel, C.IDX_VEL)
    cert = make_cert(
        exact=False,
        triggers=TRIGGERS["OdomVelocityEvidence"],
        nll_per_ess=0.5 * r_vel @ L3 @ r_vel,
        lift_strength=lift,
    )
    return L, h, cert, r_vel


def odom_yawrate_evidence(
    omega_z_pred: jnp.ndarray,
    omega_z_odom: jnp.ndarray,
    sigma_wz: jnp.ndarray,
    dt: jnp.ndarray,
    var_prev_yaw: jnp.ndarray = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, Cert]:
    """Yaw-rate factor as a yaw-INCREMENT constraint over the scan interval:
    r = (w_odom - w_pred) dt with covariance sigma_wz^2 dt^2.

    The reference injects the raw rad/s residual into the rotation slot with
    the rate precision (odom_twist_evidence.py:191-213) — dimensionally a
    rad/s quantity read as rad, which integrates the gyro-vs-wheel rate
    mismatch (gyro bias included) straight into yaw at ~1e6 weight.
    """
    r_wz = (omega_z_odom - omega_z_pred) * dt
    # head-marginal inflation: this is a relative (increment) constraint on
    # an uncertain head; without the prior yaw marginal it out-votes every
    # absolute yaw correction ~1e4:1 and the filter integrates rate forever.
    var = sigma_wz * sigma_wz * dt * dt + var_prev_yaw + C.EPS_MASS
    precision = 1.0 / var
    yaw_idx = C.IDX_ROT.start + 2
    L = jnp.zeros((C.D_Z, C.D_Z), dtype=BELIEF_DTYPE).at[yaw_idx, yaw_idx].set(precision)
    h = jnp.zeros((C.D_Z,), dtype=BELIEF_DTYPE).at[yaw_idx].set(precision * r_wz)
    cert = make_cert(
        exact=False,
        triggers=TRIGGERS["OdomYawRateEvidence"],
        nll_per_ess=0.5 * r_wz * r_wz * precision,
    )
    return L, h, cert


class KinematicConsistency(NamedTuple):
    L: jnp.ndarray
    h: jnp.ndarray
    r_trans: jnp.ndarray
    r_rot: jnp.ndarray


def pose_twist_kinematic_consistency(
    pose_prev: jnp.ndarray,  # (6,)
    pose_curr: jnp.ndarray,  # (6,)
    v_body: jnp.ndarray,  # (3,)
    omega_body: jnp.ndarray,  # (3,)
    dt: jnp.ndarray,
    Sigma_v: jnp.ndarray,  # (3, 3)
    Sigma_omega: jnp.ndarray,  # (3, 3)
    Sigma_prev_pos: jnp.ndarray = None,  # (3,3) prior position marginal
    Sigma_prev_rot: jnp.ndarray = None,  # (3,3) prior rotation marginal
    eps_psd: float = C.EPS_PSD,
    eps_lift: float = C.EPS_LIFT,
) -> Tuple[KinematicConsistency, Cert]:
    """Penalize pose change inconsistent with integrated twist:
    Log(X_prev^{-1} X_curr) ≈ [R_prev v dt; omega dt]."""
    R_prev = se3.so3_exp(pose_prev[3:6])
    R_curr = se3.so3_exp(pose_curr[3:6])

    dp_pred = (R_prev @ v_body) * dt
    dtheta_pred = omega_body * dt
    dp_actual = pose_curr[:3] - pose_prev[:3]
    dtheta_actual = se3.so3_log(R_prev.T @ R_curr)
    # Translation residual transported into the current body/anchor tangent
    # frame (the chart's rho frame); rotation residual is already a
    # body-frame relative rotation.
    r_trans_world = dp_pred - dp_actual
    r_trans = R_curr.T @ r_trans_world
    r_rot = dtheta_pred - dtheta_actual

    dt2 = dt * dt + eps_psd
    # Head-marginal inflation (see evidence_imu.imu_preintegration_factor):
    # the previous pose is uncertain; a relative factor must carry it.
    St_extra = 0.0 if Sigma_prev_pos is None else Sigma_prev_pos
    Sr_extra = 0.0 if Sigma_prev_rot is None else Sigma_prev_rot
    St, _ = linalg.domain_projection_psd(dt2 * Sigma_v + St_extra, eps_psd)
    Sr, _ = linalg.domain_projection_psd(dt2 * Sigma_omega + Sr_extra, eps_psd)
    Lt, lift_t = linalg.spd_inverse_lifted(St, eps_lift)
    Lr, lift_r = linalg.spd_inverse_lifted(Sr, eps_lift)

    L = jnp.zeros((C.D_Z, C.D_Z), dtype=BELIEF_DTYPE)
    h = jnp.zeros((C.D_Z,), dtype=BELIEF_DTYPE)
    L = L.at[C.IDX_TRANS, C.IDX_TRANS].set(Lt).at[C.IDX_ROT, C.IDX_ROT].set(Lr)
    h = h.at[C.IDX_TRANS].set(Lt @ r_trans).at[C.IDX_ROT].set(Lr @ r_rot)

    cert = make_cert(
        exact=False,
        triggers=TRIGGERS["PoseTwistKinematicConsistency"],
        nll_per_ess=0.5 * (r_trans @ Lt @ r_trans + r_rot @ Lr @ r_rot),
        lift_strength=lift_t + lift_r,
    )
    return KinematicConsistency(L=L, h=h, r_trans=r_trans, r_rot=r_rot), cert


def odom_dependence_inflation(
    r_trans: jnp.ndarray, r_rot: jnp.ndarray, eps_mass: float = C.EPS_MASS
) -> Tuple[jnp.ndarray, Cert]:
    """Continuous downscale of odom evidence from pose<->twist inconsistency:
    scale = 1 / (1 + |r|^2)."""
    mag = jnp.linalg.norm(r_trans) + jnp.linalg.norm(r_rot)
    scale = 1.0 / (1.0 + mag * mag + eps_mass)
    cert = make_cert(
        exact=False, triggers=TRIGGERS["OdomDependenceInflation"], trust_alpha=scale
    )
    return scale, cert


def planar_z_prior(
    pose_pred: jnp.ndarray,
    z_ref: float = C.PLANAR_Z_REF,
    sigma_z: float = C.PLANAR_Z_SIGMA,
) -> Tuple[jnp.ndarray, jnp.ndarray, Cert]:
    """Soft z = z_ref; injects precision into L[2,2]."""
    r_z = z_ref - pose_pred[2]
    precision = 1.0 / (sigma_z * sigma_z)
    z_idx = C.IDX_TRANS.start + 2
    L = jnp.zeros((C.D_Z, C.D_Z), dtype=BELIEF_DTYPE).at[z_idx, z_idx].set(precision)
    h = jnp.zeros((C.D_Z,), dtype=BELIEF_DTYPE).at[z_idx].set(precision * r_z)
    cert = make_cert(exact=False, triggers=TRIGGERS["PlanarZPrior"])
    return L, h, cert


def velocity_z_prior(
    v_z_pred: jnp.ndarray, sigma_vz: float = C.PLANAR_VZ_SIGMA
) -> Tuple[jnp.ndarray, jnp.ndarray, Cert]:
    """Soft v_z = 0 for ground robots."""
    precision = 1.0 / (sigma_vz * sigma_vz)
    vz_idx = C.IDX_VEL.start + 2
    L = jnp.zeros((C.D_Z, C.D_Z), dtype=BELIEF_DTYPE).at[vz_idx, vz_idx].set(precision)
    h = jnp.zeros((C.D_Z,), dtype=BELIEF_DTYPE).at[vz_idx].set(precision * (-v_z_pred))
    cert = make_cert(exact=False, triggers=TRIGGERS["VelocityZPrior"])
    return L, h, cert
