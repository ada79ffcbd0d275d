"""IMU evidence factors: vMF gravity (time-resolved), gyro rotation,
preintegration vel/pos factor, dependence inflation.

Parity map:
  - time-resolved vMF gravity evidence with transport-consistency
    reliability: reference operators/imu_evidence.py:276-559.
      transport error  e_k = |d f/dt + omega x f|  (gravity-dominant => ~0)
      reliability_k    = exp(-e_k^2 / 2 sigma^2), sigma = MAD-based (self-adaptive)
      vMF factor       ell(dtheta) = -kappa <mu(dtheta), xbar>,
      Laplace at 0:    g = -kappa (mu0 x xbar),
                       H ≈ kappa [ (x·mu) I - 1/2 (x mu^T + mu x^T) ]
  - imu_dependence_inflation: imu_evidence.py:562-589 (1/(1+sigma^2)).
  - gyro rotation factor: operators/imu_gyro_evidence.py:627-752
      r = Log(R_end_pred^T R_start Exp(delta_rot_meas)), Sigma = Sigma_g dt_int,
      continuous mass scale dt/(dt+eps) (evidence -> 0 as dt_int -> 0).
  - preintegration vel/pos factor: operators/imu_preintegration_factor.py:798-932
      v_imu = v_i + R_i dv_body ; p_imu = p_i + v_i dt + R_i dp_body
      Sigma_v = Sigma_a dt ; Sigma_p = Sigma_a dt^3.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

from gcslam_tpu.utils.xla import jnp, BELIEF_DTYPE
from gcslam_tpu import constants as C
from gcslam_tpu.ops import linalg, se3
from gcslam_tpu.ops.certs import Cert, make_cert, TRIGGERS
from gcslam_tpu.ops.kappa import kappa_from_resultant


class GravityEvidence(NamedTuple):
    L: jnp.ndarray  # (22, 22)
    h: jnp.ndarray  # (22,)
    kappa: jnp.ndarray
    ess_weighted: jnp.ndarray
    ess_raw: jnp.ndarray
    mean_reliability: jnp.ndarray
    transport_sigma: jnp.ndarray
    Rbar: jnp.ndarray


def _transport_consistency(accel: jnp.ndarray, gyro: jnp.ndarray, dt: jnp.ndarray, eps: float):
    """|df/dt + omega x f| per sample (central differences; fwd/bwd at ends)."""
    df = jnp.zeros_like(accel)
    df = df.at[1:-1].set((accel[2:] - accel[:-2]) / (2.0 * dt + eps))
    df = df.at[0].set((accel[1] - accel[0]) / (dt + eps))
    df = df.at[-1].set((accel[-1] - accel[-2]) / (dt + eps))
    e = df + jnp.cross(gyro, accel)
    return jnp.linalg.norm(e, axis=-1)


def imu_gravity_evidence_time_resolved(
    rotvec_world_body: jnp.ndarray,  # (3,) linearization orientation
    imu_accel: jnp.ndarray,  # (M, 3)
    imu_gyro: jnp.ndarray,  # (M, 3)
    weights: jnp.ndarray,  # (M,)
    accel_bias: jnp.ndarray,  # (3,)
    gravity_W: jnp.ndarray,  # (3,)
    dt_imu: jnp.ndarray,
    eps_psd: float = C.EPS_PSD,
    eps_mass: float = C.EPS_MASS,
) -> Tuple[GravityEvidence, Cert]:
    R0 = se3.so3_exp(rotvec_world_body)
    g_hat = gravity_W / (jnp.linalg.norm(gravity_W) + eps_mass)
    minus_g_hat = -g_hat

    a_corr = imu_accel - accel_bias[None, :]

    # Reliability weighting from transport consistency (self-adaptive MAD sigma).
    e_mag = _transport_consistency(a_corr, imu_gyro, dt_imu, eps_mass)
    med = jnp.median(e_mag)
    mad = jnp.median(jnp.abs(e_mag - med))
    sigma_t = mad / 0.6745 + eps_mass
    reliability = jnp.exp(-0.5 * (e_mag / sigma_t) ** 2)

    w = weights * reliability
    ess_w = jnp.sum(w)
    ess_raw = jnp.sum(weights)
    a_norm = jnp.linalg.norm(a_corr, axis=-1, keepdims=True)
    x_dir = a_corr / (a_norm + eps_mass)
    S = jnp.sum(w[:, None] * x_dir, axis=0)
    S_norm = jnp.linalg.norm(S)
    xbar = S / (S_norm + eps_mass)
    Rbar = S_norm / (ess_w + eps_mass)

    kappa, _ = kappa_from_resultant(Rbar)

    mu0 = R0.T @ minus_g_hat
    x_dot_mu = xbar @ mu0
    g_rot = -kappa * jnp.cross(mu0, xbar)
    I3 = jnp.eye(3, dtype=BELIEF_DTYPE)
    H_rot = kappa * (x_dot_mu * I3 - 0.5 * (jnp.outer(xbar, mu0) + jnp.outer(mu0, xbar)))
    H_psd, pc = linalg.domain_projection_psd(linalg.sym(H_rot), eps_psd)

    L = jnp.zeros((C.D_Z, C.D_Z), dtype=BELIEF_DTYPE).at[C.IDX_ROT, C.IDX_ROT].set(H_psd)
    h = jnp.zeros((C.D_Z,), dtype=BELIEF_DTYPE).at[C.IDX_ROT].set(-g_rot)

    mean_rel = jnp.mean(reliability)
    nll = -kappa * x_dot_mu
    cert = make_cert(
        exact=False,
        triggers=TRIGGERS["ImuAccelDirectionTimeResolved"]
        | TRIGGERS["TransportConsistencyWeighting"]
        | TRIGGERS["KappaLowRApproximation"],
        eig_min=pc.eig_min,
        eig_max=pc.eig_max,
        cond=pc.cond,
        near_null_count=pc.near_null_count,
        ess_total=ess_w,
        support_frac=mean_rel,
        nll_per_ess=nll / (ess_w + eps_mass),
        directional_score=Rbar,
        psd_projection_delta=pc.projection_delta,
        mass_epsilon_ratio=ess_w / (ess_raw + eps_mass),
        trust_alpha=mean_rel,
    )
    result = GravityEvidence(
        L=L,
        h=h,
        kappa=kappa,
        ess_weighted=ess_w,
        ess_raw=ess_raw,
        mean_reliability=mean_rel,
        transport_sigma=sigma_t,
        Rbar=Rbar,
    )
    return result, cert


def imu_dependence_inflation(
    transport_sigma: jnp.ndarray, eps_mass: float = C.EPS_MASS
) -> Tuple[jnp.ndarray, Cert]:
    sigma = jnp.maximum(transport_sigma, 0.0)
    scale = 1.0 / (1.0 + sigma * sigma + eps_mass)
    cert = make_cert(exact=False, triggers=TRIGGERS["ImuDependenceInflation"], trust_alpha=scale)
    return scale, cert


def imu_gyro_rotation_evidence(
    rotvec_start_WB: jnp.ndarray,  # (3,)
    rotvec_end_pred_WB: jnp.ndarray,  # (3,)
    delta_rotvec_meas: jnp.ndarray,  # (3,) preintegrated relative rotation
    Sigma_g: jnp.ndarray,  # (3, 3) gyro PSD proxy
    dt_int: jnp.ndarray,
    eps_psd: float = C.EPS_PSD,
    eps_lift: float = C.EPS_LIFT,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Cert]:
    """Returns (L, h, r_rot, cert)."""
    R_start = se3.so3_exp(rotvec_start_WB)
    R_end_imu = R_start @ se3.so3_exp(delta_rotvec_meas)
    R_end_pred = se3.so3_exp(rotvec_end_pred_WB)
    r_rot = se3.so3_log(R_end_pred.T @ R_end_imu)

    dt_pos = jnp.maximum(dt_int, 0.0)
    dt_eff = dt_pos + C.EPS_MASS
    mass_scale = dt_pos / dt_eff  # -> 0 continuously when no samples

    Sigma_rot, _ = linalg.domain_projection_psd(Sigma_g * dt_eff, eps_psd)
    L_rot, lift = linalg.spd_inverse_lifted(Sigma_rot, eps_lift)
    L_scaled = mass_scale * L_rot

    L = jnp.zeros((C.D_Z, C.D_Z), dtype=BELIEF_DTYPE).at[C.IDX_ROT, C.IDX_ROT].set(L_scaled)
    h = jnp.zeros((C.D_Z,), dtype=BELIEF_DTYPE).at[C.IDX_ROT].set(L_scaled @ r_rot)

    cert = make_cert(
        exact=False,
        triggers=TRIGGERS["ImuGyroRotationGaussian"],
        nll_per_ess=0.5 * r_rot @ L_rot @ r_rot,
        lift_strength=lift,
    )
    return L, h, r_rot, cert


class PreintFactor(NamedTuple):
    L: jnp.ndarray
    h: jnp.ndarray
    r_vel: jnp.ndarray
    r_pos: jnp.ndarray


def imu_preintegration_factor(
    p_start_world: jnp.ndarray,
    rotvec_start_WB: jnp.ndarray,
    v_start_world: jnp.ndarray,
    p_end_pred_world: jnp.ndarray,
    v_end_pred_world: jnp.ndarray,
    rotvec_end_pred_WB: jnp.ndarray,
    delta_v_body: jnp.ndarray,
    delta_p_body: jnp.ndarray,
    Sigma_a: jnp.ndarray,
    dt_int: jnp.ndarray,
    Sigma_prev_pos: jnp.ndarray = None,  # (3,3) prior position marginal
    Sigma_prev_vel: jnp.ndarray = None,  # (3,3) prior velocity marginal
    eps_psd: float = C.EPS_PSD,
    eps_lift: float = C.EPS_LIFT,
) -> Tuple[PreintFactor, Cert]:
    R_start = se3.so3_exp(rotvec_start_WB)
    v_imu = v_start_world + R_start @ delta_v_body
    p_imu = p_start_world + v_start_world * dt_int + R_start @ delta_p_body
    r_vel = v_imu - v_end_pred_world  # world frame == velocity-block tangent frame
    # Position residual transported into the anchor/body tangent frame: the
    # chart's translation tangent is rho with t = t_anchor + R_anchor V(phi) rho,
    # so a world residual must be rotated by R_pred^T before embedding. (The
    # reference embeds the world residual directly,
    # imu_preintegration_factor.py:856-891 — only valid at yaw ~ 0.)
    R_pred = se3.so3_exp(rotvec_end_pred_WB)
    r_pos = R_pred.T @ (p_imu - p_end_pred_world)

    dt_pos = jnp.maximum(dt_int, 0.0)
    dt_eff = dt_pos + C.EPS_MASS
    mass_scale = dt_pos / dt_eff

    # Head-marginal inflation (deviation from the reference, which treats the
    # previous state as exactly known — imu_preintegration_factor.py:798-817 —
    # and therefore re-injects prior information every scan with ~mm
    # precision, freezing the filter during velocity transients): a relative
    # factor conditioned on an uncertain head has covariance
    #   Sigma_v += Sigma_vv_prev
    #   Sigma_p += Sigma_pp_prev + dt^2 Sigma_vv_prev.
    Sv_extra = 0.0 if Sigma_prev_vel is None else Sigma_prev_vel
    Sp_extra = 0.0
    if Sigma_prev_pos is not None:
        Sp_extra = Sigma_prev_pos
    if Sigma_prev_vel is not None:
        Sp_extra = Sp_extra + dt_eff**2 * Sigma_prev_vel

    Sv, _ = linalg.domain_projection_psd(Sigma_a * dt_eff + Sv_extra, eps_psd)
    Sp, _ = linalg.domain_projection_psd(Sigma_a * dt_eff**3 + Sp_extra, eps_psd)
    Lv, lift_v = linalg.spd_inverse_lifted(Sv, eps_lift)
    Lp, lift_p = linalg.spd_inverse_lifted(Sp, eps_lift)
    Lv_s = mass_scale * Lv
    Lp_s = mass_scale * Lp

    L = jnp.zeros((C.D_Z, C.D_Z), dtype=BELIEF_DTYPE)
    h = jnp.zeros((C.D_Z,), dtype=BELIEF_DTYPE)
    L = L.at[C.IDX_TRANS, C.IDX_TRANS].set(Lp_s).at[C.IDX_VEL, C.IDX_VEL].set(Lv_s)
    h = h.at[C.IDX_TRANS].set(Lp_s @ r_pos).at[C.IDX_VEL].set(Lv_s @ r_vel)

    cert = make_cert(
        exact=False,
        triggers=TRIGGERS["ImuPreintegrationVelPos"],
        nll_per_ess=0.5 * (r_vel @ Lv @ r_vel + r_pos @ Lp @ r_pos),
        lift_strength=lift_v + lift_p,
    )
    return PreintFactor(L=L, h=h, r_vel=r_vel, r_pos=r_pos), cert
