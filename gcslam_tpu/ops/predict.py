"""Prediction operators.

predict_diffusion — reference parity (operators/predict.py:44-104):
    Sigma' = e^{-2 lambda dt} Sigma + (1 - e^{-2 lambda dt})/(2 lambda) Q
round-tripped through moment form with PSD projections on both the predicted
covariance and the re-inverted information matrix. Bounded: Sigma -> Q/(2
lambda) as dt -> inf; ~pure diffusion for small dt. The MEAN does not move.

predict_imu — the 'predict' IMU mode (this framework's flagship filter):
the IMU preintegration PROPAGATES the mean (pose composes the preintegrated
delta; velocity integrates the gravity-corrected accel) and its noise
inflates the covariance, exactly as an EKF/FAST-LIO-style LIO filter. The
reference instead re-injects the preintegration as additive evidence each
scan while treating the previous state as known
(operators/imu_preintegration_factor.py:798-817), which double-counts prior
information and freezes the velocity during transients; 'evidence' mode
reproduces that behavior for parity.
"""

from __future__ import annotations

from typing import Tuple

from gcslam_tpu.utils.xla import jnp
from gcslam_tpu import constants as C
from gcslam_tpu.models.belief import Belief, mean_increment
from gcslam_tpu.ops import linalg, se3
from gcslam_tpu.ops.certs import Cert, make_cert, TRIGGERS


def predict_diffusion(
    belief_prev: Belief,
    Q: jnp.ndarray,
    dt_sec: jnp.ndarray,
    eps_psd: float = C.EPS_PSD,
    eps_lift: float = C.EPS_LIFT,
    lambda_ou: float = C.OU_DAMPING_LAMBDA,
) -> Tuple[Belief, Cert]:
    mean_prev, _ = linalg.spd_solve_lifted(belief_prev.L, belief_prev.h, eps_lift)
    cov_prev, lift_prev = linalg.spd_inverse_lifted(belief_prev.L, eps_lift)

    exp_factor = jnp.exp(-2.0 * lambda_ou * dt_sec)
    diffusion_coeff = (1.0 - exp_factor) / (2.0 * lambda_ou + jnp.finfo(cov_prev.dtype).eps)
    cov_pred = exp_factor * cov_prev + diffusion_coeff * Q

    cov_psd, cert_cov = linalg.domain_projection_psd(cov_pred, eps_psd)
    L_pred, lift_inv = linalg.spd_inverse_lifted(cov_psd, eps_lift)
    L_psd, cert_L = linalg.domain_projection_psd(L_pred, eps_psd)
    h_pred = L_psd @ mean_prev

    cert = make_cert(
        exact=False,
        triggers=TRIGGERS["PredictDiffusion"],
        eig_min=cert_L.eig_min,
        eig_max=cert_L.eig_max,
        cond=cert_L.cond,
        near_null_count=cert_L.near_null_count,
        lift_strength=lift_prev + lift_inv,
        psd_projection_delta=cert_cov.projection_delta + cert_L.projection_delta,
        dt_scale=dt_sec,
    )
    belief_pred = Belief(
        X_anchor=belief_prev.X_anchor,
        z_lin=belief_prev.z_lin,
        L=L_psd,
        h=h_pred,
        stamp=belief_prev.stamp + dt_sec,
    )
    return belief_pred, cert


def predict_imu(
    belief_prev: Belief,
    Q: jnp.ndarray,
    dt_sec: jnp.ndarray,
    delta_pose_body: jnp.ndarray,  # (6,) preintegrated [dp_body, drotvec]
    delta_v_body: jnp.ndarray,  # (3,) start-body-frame velocity change
    dt_int: jnp.ndarray,  # IMU integration time
    Sigma_g: jnp.ndarray,  # (3, 3) gyro PSD proxy
    Sigma_a: jnp.ndarray,  # (3, 3) accel PSD proxy
    eps_psd: float = C.EPS_PSD,
    eps_lift: float = C.EPS_LIFT,
    lambda_ou: float = C.OU_DAMPING_LAMBDA,
) -> Tuple[Belief, Cert]:
    """IMU-driven prediction: propagate the mean with the preintegrated
    motion, inflate the covariance with OU diffusion + preintegration noise.

        p'   = p + v dt + R dp_body          (dp_body is gravity-corrected)
        R'   = R Exp(drotvec)
        v'   = v + R dv_body
        Sig' = J OU(Sig) J^T + blkdiag(Sg dt_int | Sa dt^3, Sa dt_int)

    with the constant-velocity Jacobian J coupling pos<-vel. Biases, dt and
    extrinsic are untouched (their diffusion lives in Q).
    """
    mean_prev, _ = linalg.spd_solve_lifted(belief_prev.L, belief_prev.h, eps_lift)
    cov_prev, lift_prev = linalg.spd_inverse_lifted(belief_prev.L, eps_lift)

    # --- mean propagation (in the anchor chart) -------------------------
    pose_chart = mean_prev[C.IDX_POSE]
    X_prev = se3.se3_compose(belief_prev.X_anchor, se3.se3_exp(pose_chart))
    R_prev = se3.so3_exp(X_prev[3:6])
    v_prev = mean_prev[C.IDX_VEL]

    # Preintegration starts at v=0, so its dp lacks the v0*t carry term.
    dp_world = R_prev @ delta_pose_body[:3]
    p_new = X_prev[:3] + v_prev * dt_sec + dp_world
    R_new = R_prev @ se3.so3_exp(delta_pose_body[3:6])
    v_new = v_prev + R_prev @ delta_v_body

    X_new = jnp.concatenate([p_new, se3.so3_log(R_new)])
    pose_chart_new = se3.se3_log(se3.se3_relative(X_new, belief_prev.X_anchor))
    mean_new = mean_prev.at[C.IDX_POSE].set(pose_chart_new).at[C.IDX_VEL].set(v_new)

    # --- covariance propagation -----------------------------------------
    exp_factor = jnp.exp(-2.0 * lambda_ou * dt_sec)
    diffusion_coeff = (1.0 - exp_factor) / (2.0 * lambda_ou + jnp.finfo(cov_prev.dtype).eps)
    cov_ou = exp_factor * cov_prev + diffusion_coeff * Q

    # CV Jacobian: d p'/d v = dt (in the chart's translation/velocity axes).
    J = jnp.eye(C.D_Z, dtype=cov_ou.dtype)
    J = J.at[0:3, 6:9].set(dt_sec * jnp.eye(3, dtype=cov_ou.dtype))
    cov_pred = J @ cov_ou @ J.T

    dt_i = jnp.maximum(dt_int, 0.0) + C.EPS_MASS
    cov_pred = cov_pred.at[C.IDX_ROT, C.IDX_ROT].add(Sigma_g * dt_i)
    cov_pred = cov_pred.at[C.IDX_TRANS, C.IDX_TRANS].add(Sigma_a * dt_i**3)
    cov_pred = cov_pred.at[C.IDX_VEL, C.IDX_VEL].add(Sigma_a * dt_i)

    cov_psd, cert_cov = linalg.domain_projection_psd(cov_pred, eps_psd)
    L_pred, lift_inv = linalg.spd_inverse_lifted(cov_psd, eps_lift)
    L_psd, cert_L = linalg.domain_projection_psd(L_pred, eps_psd)
    h_pred = L_psd @ mean_new

    cert = make_cert(
        exact=False,
        triggers=TRIGGERS["PredictDiffusion"] | TRIGGERS["ImuPreintegrationVelPos"],
        eig_min=cert_L.eig_min,
        eig_max=cert_L.eig_max,
        cond=cert_L.cond,
        near_null_count=cert_L.near_null_count,
        lift_strength=lift_prev + lift_inv,
        psd_projection_delta=cert_cov.projection_delta + cert_L.projection_delta,
        dt_scale=dt_sec,
    )
    belief_pred = Belief(
        X_anchor=belief_prev.X_anchor,
        z_lin=belief_prev.z_lin,
        L=L_psd,
        h=h_pred,
        stamp=belief_prev.stamp + dt_sec,
    )
    return belief_pred, cert
