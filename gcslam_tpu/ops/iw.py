"""Inverse-Wishart adaptive noise: process Q and per-sensor measurement Sigma.

Noise is a random variable (spec contract 6): both the process diffusion Q
and the measurement covariances are blockwise IW states updated every scan
from commutative sufficient statistics with forgetful retention.

Parity map:
  - states: reference backend/structures/inverse_wishart_jax.py:851-913 and
    measurement_noise_iw_jax.py:937-981 (nu = p + 1 + 0.5; Psi = Sigma_prior*0.5)
  - Q assembly from blockwise IW means: operators/inverse_wishart_jax.py:465-498
  - process suffstats from info-form innovation (r r^T + Sigma_post):
    operators/inverse_wishart_jax.py:501-553
  - apply with retention rho and smooth nu clipping:
    operators/inverse_wishart_jax.py:556-615
  - measurement mode Sigma = Psi/(nu+p+1), gyro/accel suffstats:
    operators/measurement_noise_iw_jax.py:652-833
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

from gcslam_tpu.utils.xla import jax, jnp, BELIEF_DTYPE
from gcslam_tpu import constants as C
from gcslam_tpu.ops import linalg, se3

# Process blocks over the 22D tangent: [trans, rot, vel, bg, ba, dt(1), ex(6)]
PROCESS_BLOCK_DIMS = np.array([3, 3, 3, 3, 3, 1, 6], dtype=np.int32)
PROCESS_BLOCK_STARTS = np.array([0, 3, 6, 9, 12, 15, 16], dtype=np.int32)
_rows = np.arange(6)[None, :] < PROCESS_BLOCK_DIMS[:, None]
PROCESS_BLOCK_MASKS = (_rows[:, :, None] & _rows[:, None, :]).astype(np.float64)  # (7,6,6)

PROCESS_RHO = np.array(
    [C.IW_RHO_TRANS, C.IW_RHO_ROT, C.IW_RHO_VEL, C.IW_RHO_BG, C.IW_RHO_BA, C.IW_RHO_DT, C.IW_RHO_EX]
)
MEAS_RHO = np.array([C.IW_RHO_MEAS_GYRO, C.IW_RHO_MEAS_ACCEL, C.IW_RHO_MEAS_LIDAR])


class ProcessNoiseIW(NamedTuple):
    nu: jnp.ndarray  # (7,)
    Psi: jnp.ndarray  # (7, 6, 6) zero-padded blocks


class MeasurementNoiseIW(NamedTuple):
    """Blocks: [gyro (PSD rad^2/s), accel (PSD m^2/s^3), lidar (cov m^2)]."""

    nu: jnp.ndarray  # (3,)
    Psi: jnp.ndarray  # (3, 3, 3)


def datasheet_process_noise() -> ProcessNoiseIW:
    dims = PROCESS_BLOCK_DIMS.astype(np.float64)
    nu = jnp.asarray(dims + 1.0 + C.IW_NU_WEAK_ADD, dtype=BELIEF_DTYPE)
    diffusion = np.array(
        [
            C.PROCESS_TRANS_DIFFUSION,
            C.PROCESS_ROT_DIFFUSION,
            C.PROCESS_VEL_DIFFUSION,
            C.PROCESS_BG_DIFFUSION,
            C.PROCESS_BA_DIFFUSION,
            C.PROCESS_DT_DIFFUSION,
            C.PROCESS_EXTRINSIC_DIFFUSION,
        ]
    )
    Psi = np.zeros((7, 6, 6))
    for i in range(7):
        d = int(PROCESS_BLOCK_DIMS[i])
        Psi[i, :d, :d] = np.eye(d) * diffusion[i] * C.IW_NU_WEAK_ADD
    return ProcessNoiseIW(nu=nu, Psi=jnp.asarray(Psi, dtype=BELIEF_DTYPE))


def datasheet_measurement_noise(lidar_sigma: float = C.LIDAR_SIGMA_MEAS) -> MeasurementNoiseIW:
    nu = jnp.asarray(np.full(3, 3.0 + 1.0 + C.IW_NU_WEAK_ADD), dtype=BELIEF_DTYPE)
    Psi = np.stack(
        [
            np.eye(3) * C.IMU_GYRO_NOISE_DENSITY * C.IW_NU_WEAK_ADD,
            np.eye(3) * C.IMU_ACCEL_NOISE_DENSITY * C.IW_NU_WEAK_ADD,
            np.eye(3) * lidar_sigma * C.IW_NU_WEAK_ADD,
        ]
    )
    return MeasurementNoiseIW(nu=nu, Psi=jnp.asarray(Psi, dtype=BELIEF_DTYPE))


def process_noise_to_Q(state: ProcessNoiseIW, eps_psd: float = C.EPS_PSD) -> jnp.ndarray:
    """Assemble 22x22 Q from blockwise IW means E[Sigma] = Psi/(nu - p - 1)."""
    dims = jnp.asarray(PROCESS_BLOCK_DIMS, dtype=BELIEF_DTYPE)
    denom = linalg.softplus_positive(state.nu - dims - 1.0)
    Q_blocks = state.Psi / denom[:, None, None] * jnp.asarray(PROCESS_BLOCK_MASKS, dtype=BELIEF_DTYPE)
    Q = jnp.zeros((C.D_Z, C.D_Z), dtype=BELIEF_DTYPE)
    for i in range(7):  # static unroll: 7 dynamic_update_slices
        s = int(PROCESS_BLOCK_STARTS[i])
        d = int(PROCESS_BLOCK_DIMS[i])
        Q = jax.lax.dynamic_update_slice(Q, Q_blocks[i, :d, :d], (s, s))
    Q_psd, _ = linalg.domain_projection_psd(Q, eps_psd)
    return Q_psd


def _pack_blocks_vec(r: jnp.ndarray) -> jnp.ndarray:
    """(22,) -> (7, 6) zero-padded per-block vectors."""
    out = jnp.zeros((7, 6), dtype=r.dtype)
    out = out.at[0, :3].set(r[C.IDX_TRANS])
    out = out.at[1, :3].set(r[C.IDX_ROT])
    out = out.at[2, :3].set(r[C.IDX_VEL])
    out = out.at[3, :3].set(r[C.IDX_BG])
    out = out.at[4, :3].set(r[C.IDX_BA])
    out = out.at[5, 0].set(r[C.IDX_DT])
    out = out.at[6, :6].set(r[C.IDX_EX])
    return out


def _pack_blocks_mat(S: jnp.ndarray) -> jnp.ndarray:
    """(22,22) -> (7, 6, 6) zero-padded diagonal blocks."""
    out = jnp.zeros((7, 6, 6), dtype=S.dtype)
    out = out.at[0, :3, :3].set(S[C.IDX_TRANS, C.IDX_TRANS])
    out = out.at[1, :3, :3].set(S[C.IDX_ROT, C.IDX_ROT])
    out = out.at[2, :3, :3].set(S[C.IDX_VEL, C.IDX_VEL])
    out = out.at[3, :3, :3].set(S[C.IDX_BG, C.IDX_BG])
    out = out.at[4, :3, :3].set(S[C.IDX_BA, C.IDX_BA])
    out = out.at[5, 0, 0].set(S[C.IDX_DT, C.IDX_DT])
    out = out.at[6, :6, :6].set(S[C.IDX_EX, C.IDX_EX])
    return out


def process_iw_suffstats(
    L_pred: jnp.ndarray,
    h_pred: jnp.ndarray,
    L_post: jnp.ndarray,
    h_post: jnp.ndarray,
    eps_lift: float = C.EPS_LIFT,
    L_evidence: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Commutative process-noise suffstats from the info-form innovation:
    dPsi_b = w_b * (r r^T + Sigma_post)_b with r = mu_post - mu_pred,
    dnu_b = w_b.

    w_b is the block's evidence-vs-prior OBSERVABILITY weight
    tr(L_ev,b) / (tr(L_ev,b) + tr(L_pred,b)). Without it (the reference form,
    operators/inverse_wishart_jax.py:72-125), an UNOBSERVED block feeds its
    own prior variance back as a pseudo-measurement of Q: Sigma_post for an
    unobserved block is just the Q-grown prior, so Psi accumulates it,
    Q inflates, Sigma grows faster — an exponential runaway. Measured on a
    40 s run: Q_dt 4e-7 -> 2.7e-3, dt_std 0.01 -> 0.09 s, which flattened
    the soft IMU windows and under-integrated every gyro increment ~30%.
    With w_b, an unobserved block contributes ~nothing and the forgetful
    rho-decay holds the IW at its prior."""
    mu_pred, _ = linalg.spd_solve_lifted(L_pred, h_pred, eps_lift)
    mu_post, _ = linalg.spd_solve_lifted(L_post, h_post, eps_lift)
    Sigma_post, _ = linalg.spd_inverse_lifted(L_post, eps_lift)
    r_blocks = _pack_blocks_vec(mu_post - mu_pred)
    rrT = jnp.einsum("bi,bj->bij", r_blocks, r_blocks)
    S_blocks = _pack_blocks_mat(Sigma_post)
    dPsi = (rrT + S_blocks) * jnp.asarray(PROCESS_BLOCK_MASKS, dtype=rrT.dtype)
    dnu = jnp.ones((7,), dtype=rrT.dtype)
    if L_evidence is not None:
        Lev_b = _pack_blocks_mat(L_evidence)
        Lpr_b = _pack_blocks_mat(L_pred)
        tr_ev = jnp.einsum("bii->b", Lev_b)
        tr_pr = jnp.einsum("bii->b", Lpr_b)
        w = tr_ev / (tr_ev + tr_pr + C.EPS_MASS)
        dPsi = dPsi * w[:, None, None]
        dnu = dnu * w
    return dPsi, dnu


def process_iw_apply(
    state: ProcessNoiseIW,
    dPsi: jnp.ndarray,
    dnu: jnp.ndarray,
    eps_psd: float = C.EPS_PSD,
    nu_max: float = C.IW_NU_MAX,
) -> Tuple[ProcessNoiseIW, jnp.ndarray]:
    """Discrete-time forgetful update: Psi <- rho Psi + dPsi; nu <- rho nu + dnu
    with per-block PSD projection and smooth nu clipping.
    Returns (state, cert_vec=[psd_delta, nu_delta])."""
    rho = jnp.asarray(PROCESS_RHO, dtype=state.Psi.dtype)
    Psi_raw = rho[:, None, None] * state.Psi + dPsi
    Psi_raw = Psi_raw * jnp.asarray(PROCESS_BLOCK_MASKS, dtype=state.Psi.dtype)
    Psi_psd, pc = linalg.domain_projection_psd(Psi_raw, eps_psd)
    Psi_psd = Psi_psd * jnp.asarray(PROCESS_BLOCK_MASKS, dtype=state.Psi.dtype)

    dims = jnp.asarray(PROCESS_BLOCK_DIMS, dtype=state.nu.dtype)
    nu_raw = rho * state.nu + dnu
    nu_min = dims + 1.0 + C.IW_NU_WEAK_ADD
    nu = linalg.smooth_interval_project(nu_raw, nu_min, nu_max)
    cert_vec = jnp.stack([jnp.sum(pc.projection_delta), jnp.sum(jnp.abs(nu - nu_raw))])
    return ProcessNoiseIW(nu=nu, Psi=Psi_psd), cert_vec


def measurement_noise_mode(state: MeasurementNoiseIW, idx: int, eps_psd: float = C.EPS_PSD) -> jnp.ndarray:
    """IW mode Sigma = Psi/(nu + p + 1) — always defined, used operationally."""
    denom = state.nu[idx] + 3.0 + 1.0
    Sigma, _ = linalg.domain_projection_psd(state.Psi[idx] / denom, eps_psd)
    return Sigma


def measurement_iw_apply(
    state: MeasurementNoiseIW,
    dPsi: jnp.ndarray,
    dnu: jnp.ndarray,
    eps_psd: float = C.EPS_PSD,
    nu_max: float = C.IW_NU_MAX,
) -> Tuple[MeasurementNoiseIW, jnp.ndarray]:
    rho = jnp.asarray(MEAS_RHO, dtype=state.Psi.dtype)
    Psi_raw = linalg.sym(rho[:, None, None] * state.Psi + dPsi)
    Psi_psd, pc = linalg.domain_projection_psd(Psi_raw, eps_psd)
    nu_raw = rho * state.nu + dnu
    nu_min = jnp.full((3,), 3.0 + 1.0 + C.IW_NU_WEAK_ADD, dtype=state.nu.dtype)
    nu = linalg.smooth_interval_project(nu_raw, nu_min, nu_max)
    cert_vec = jnp.stack([jnp.sum(pc.projection_delta), jnp.sum(jnp.abs(nu - nu_raw))])
    return MeasurementNoiseIW(nu=nu, Psi=Psi_psd), cert_vec


def gyro_meas_suffstats(
    imu_gyro: jnp.ndarray,
    weights: jnp.ndarray,
    gyro_bias: jnp.ndarray,
    omega_avg: jnp.ndarray,
    dt_imu: jnp.ndarray,
    eps_mass: float = C.EPS_MASS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gyro Sigma suffstats: weighted outer products of rate residuals
    (gyro - bg - omega_avg), mapped to PSD units by * dt_imu."""
    w_norm = weights / (jnp.sum(weights) + eps_mass)
    r = imu_gyro - gyro_bias[None, :] - omega_avg[None, :]
    rrT = jnp.einsum("m,mi,mj->ij", w_norm, r, r)
    rrT_psd, _ = linalg.domain_projection_psd(linalg.sym(rrT))
    rrT_psd = rrT_psd * jnp.maximum(dt_imu, 1e-12)
    dPsi = jnp.zeros((3, 3, 3), dtype=rrT.dtype).at[0].set(rrT_psd)
    return dPsi, jnp.asarray([1.0, 0.0, 0.0], dtype=rrT.dtype)


def accel_meas_suffstats(
    rotvec_world_body: jnp.ndarray,
    imu_accel: jnp.ndarray,
    weights: jnp.ndarray,
    accel_bias: jnp.ndarray,
    gravity_W: jnp.ndarray,
    dt_imu: jnp.ndarray,
    eps_mass: float = C.EPS_MASS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Accel Sigma suffstats: residuals vs predicted specific force -R^T g."""
    R0 = se3.so3_exp(rotvec_world_body)
    f_pred = -(R0.T @ gravity_W)
    w_norm = weights / (jnp.sum(weights) + eps_mass)
    r = imu_accel - accel_bias[None, :] - f_pred[None, :]
    rrT = jnp.einsum("m,mi,mj->ij", w_norm, r, r)
    rrT_psd, _ = linalg.domain_projection_psd(linalg.sym(rrT))
    rrT_psd = rrT_psd * jnp.maximum(dt_imu, 1e-12)
    dPsi = jnp.zeros((3, 3, 3), dtype=rrT.dtype).at[1].set(rrT_psd)
    return dPsi, jnp.asarray([0.0, 1.0, 0.0], dtype=rrT.dtype)


def lidar_meas_suffstats(
    residuals: jnp.ndarray,  # (B, 3)
    weights: jnp.ndarray,  # (B,)
    eps_mass: float = C.EPS_MASS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LiDAR translation Sigma suffstats from weighted residual outer products
    (discrete covariance; no dt mapping) — reference
    measurement_noise_iw_jax.py:104-131 (dPsi = average outer product).

    Deviation (same observability-weighting rationale as process_iw_suffstats):
    the reference's dnu=1-per-scan counts a scan with ZERO matched pairs as a
    full pseudo-observation of Sigma_lidar=dPsi~0, shrinking Sigma whenever
    the map is empty (startup, new area). Both dPsi and dnu are scaled by the
    continuous support s = w_sum/(w_sum + c): unmatched scans contribute
    ~nothing and the rho-retention holds the prior."""
    w_sum = jnp.sum(weights)
    w_norm = weights / (w_sum + eps_mass)
    rrT = jnp.einsum("b,bi,bj->ij", w_norm, residuals, residuals)
    rrT_psd, _ = linalg.domain_projection_psd(linalg.sym(rrT))
    support = w_sum / (w_sum + 0.1)
    dPsi = jnp.zeros((3, 3, 3), dtype=rrT.dtype).at[2].set(support * rrT_psd)
    return dPsi, support * jnp.asarray([0.0, 0.0, 1.0], dtype=rrT.dtype)
