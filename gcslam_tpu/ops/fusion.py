"""Evidence tempering, excitation scaling, fusion-alpha, additive info fusion.

Parity map:
  - power tempering beta from certificate sentinels (dt_asymmetry,
    z_to_xy_ratio, ess/excitation): reference backend/pipeline.py:1049-1117.
  - Fisher excitation scales + prior row/col scaling for dt & extrinsic:
    operators/excitation.py:363-413.
  - fusion_scale_from_certificates (continuous trust alpha):
    operators/fusion.py:459-555.
  - info_fusion_additive (L_post = L_pred + alpha L_ev, PSD projected):
    operators/fusion.py:563-643.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

from gcslam_tpu.utils.xla import jnp
from gcslam_tpu import constants as C
from gcslam_tpu.ops import linalg
from gcslam_tpu.ops.certs import Cert, make_cert, TRIGGERS


class ObservabilitySentinels(NamedTuple):
    dt_asymmetry: jnp.ndarray
    z_to_xy_ratio: jnp.ndarray


def observability_sentinels(L_evidence_raw: jnp.ndarray, eps: float = C.EPS_MASS) -> ObservabilitySentinels:
    """Overconfidence sentinels from raw evidence (pipeline.py:1069-1089)."""
    dt_pose = jnp.linalg.norm(L_evidence_raw[C.IDX_DT, C.IDX_POSE]) + jnp.linalg.norm(
        L_evidence_raw[C.IDX_POSE, C.IDX_DT]
    )
    dt_vel = jnp.linalg.norm(L_evidence_raw[C.IDX_DT, C.IDX_VEL]) + jnp.linalg.norm(
        L_evidence_raw[C.IDX_VEL, C.IDX_DT]
    )
    dt_asym = jnp.clip(jnp.abs(dt_vel - dt_pose) / (dt_vel + dt_pose + eps), 0.0, 1.0)
    L_xx = jnp.abs(L_evidence_raw[0, 0])
    L_yy = jnp.abs(L_evidence_raw[1, 1])
    L_zz = jnp.abs(L_evidence_raw[2, 2])
    z_to_xy = L_zz / (0.5 * (L_xx + L_yy) + eps)
    return ObservabilitySentinels(dt_asymmetry=dt_asym, z_to_xy_ratio=z_to_xy)


def power_tempering_beta(
    sentinels: ObservabilitySentinels,
    ess_total: jnp.ndarray,
    excitation_total: jnp.ndarray,
    beta_min: float = C.POWER_BETA_MIN,
    exc_c: float = C.POWER_BETA_EXC_C,
    z_c: float = C.POWER_BETA_Z_C,
    eps_mass: float = C.EPS_MASS,
) -> Tuple[jnp.ndarray, Cert]:
    """Closed-form tempering beta in [beta_min, 1] (pipeline.py:1091-1117)."""
    ess_to_exc = ess_total / (excitation_total + eps_mass)
    s_dt = sentinels.dt_asymmetry
    s_z = sentinels.z_to_xy_ratio / (sentinels.z_to_xy_ratio + z_c)
    s_exc = 1.0 / (1.0 + ess_to_exc / exc_c)
    s = jnp.clip(s_dt * s_z * s_exc, 0.0, 1.0)
    beta = jnp.clip(beta_min + (1.0 - beta_min) * s, beta_min, 1.0)
    cert = make_cert(
        exact=False,
        triggers=TRIGGERS["PowerTempering"],
        frobenius_applied=(jnp.abs(1.0 - beta) > 0.0).astype(beta.dtype),
        power_beta=beta,
    )
    return beta, cert


def excitation_scales(
    L_evidence: jnp.ndarray, L_prior: jnp.ndarray, eps: float = C.EXC_EPS
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """s = e/(e + pi + eps) per block (excitation.py:363-380)."""
    e_dt = L_evidence[C.IDX_DT, C.IDX_DT]
    e_ex = jnp.trace(L_evidence[C.IDX_EX, C.IDX_EX])
    pi_dt = L_prior[C.IDX_DT, C.IDX_DT]
    pi_ex = jnp.trace(L_prior[C.IDX_EX, C.IDX_EX])
    return e_dt / (e_dt + pi_dt + eps), e_ex / (e_ex + pi_ex + eps)


def apply_excitation_prior_scaling(
    L_prior: jnp.ndarray, h_prior: jnp.ndarray, s_dt: jnp.ndarray, s_ex: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, Cert]:
    """Scale dt/extrinsic prior rows+cols by (1 - s) (excitation.py:383-413)."""
    a_dt = 1.0 - s_dt
    a_ex = 1.0 - s_ex
    scale = jnp.ones((C.D_Z,), dtype=L_prior.dtype)
    scale = scale.at[C.IDX_DT].set(a_dt)
    scale = scale.at[C.IDX_EX].set(a_ex * jnp.ones(6, dtype=L_prior.dtype))
    # Row scaling then column scaling == outer product of per-coordinate
    # scales: cross terms get one factor, the dt/ex diagonal gets its square
    # (same as the reference's sequential row/col .at updates).
    Lp = L_prior * (scale[:, None] * scale[None, :])
    hp = h_prior * scale
    cert = make_cert(
        exact=False,
        triggers=TRIGGERS["ExcitationPriorScaling"],
        dt_scale=a_dt,
        ex_scale=a_ex,
    )
    return Lp, hp, cert


def fusion_alpha(
    cond_evidence: jnp.ndarray,
    ess_evidence: jnp.ndarray,
    support_frac: jnp.ndarray,
    excitation_total: jnp.ndarray,
    dt_asymmetry: jnp.ndarray,
    z_to_xy_ratio: jnp.ndarray,
    power_beta: jnp.ndarray,
    nll_per_ess: jnp.ndarray,
    alpha_min: float = C.ALPHA_MIN,
    alpha_max: float = C.ALPHA_MAX,
    c0_cond: float = C.C0_COND,
    eps_mass: float = C.EPS_MASS,
) -> Tuple[jnp.ndarray, Cert]:
    """Continuous trust alpha in [alpha_min, alpha_max] (fusion.py:459-555).

    With the default alpha_min == alpha_max == 1.0 this is the constant 1,
    but the control law is preserved for non-degenerate configs.
    """
    cond_quality = c0_cond / (cond_evidence + c0_cond)
    support_quality = ess_evidence / (ess_evidence + 1.0)
    mismatch_quality = jnp.exp(-nll_per_ess)
    dt_quality = jnp.clip(dt_asymmetry, 0.0, 1.0)
    z_quality = jnp.clip(z_to_xy_ratio / (z_to_xy_ratio + 1.0), 0.0, 1.0)
    exc_quality = jnp.clip(excitation_total / (excitation_total + 1.0), 0.0, 1.0)
    base = jnp.sqrt(cond_quality * support_quality)
    quality = (
        base * mismatch_quality * dt_quality * z_quality * exc_quality
        * jnp.clip(power_beta, 0.0, 1.0)
    )
    alpha = jnp.clip(alpha_min + (alpha_max - alpha_min) * quality, alpha_min, alpha_max)
    cert = make_cert(
        exact=True,
        trust_alpha=alpha,
        exc_dt_effect=excitation_total,
        ess_total=ess_evidence,
        support_frac=support_frac,
    )
    return alpha, cert


def info_fusion_additive(
    L_pred: jnp.ndarray,
    h_pred: jnp.ndarray,
    L_evidence: jnp.ndarray,
    h_evidence: jnp.ndarray,
    alpha: jnp.ndarray,
    eps_psd: float = C.EPS_PSD,
) -> Tuple[jnp.ndarray, jnp.ndarray, Cert]:
    L_post_raw = L_pred + alpha * L_evidence
    h_post = h_pred + alpha * h_evidence
    L_post, pc = linalg.domain_projection_psd(L_post_raw, eps_psd)
    cert = make_cert(
        exact=False,
        triggers=TRIGGERS["InfoFusionAdditive"],
        eig_min=pc.eig_min,
        eig_max=pc.eig_max,
        cond=pc.cond,
        near_null_count=pc.near_null_count,
        psd_projection_delta=pc.projection_delta,
        trust_alpha=alpha,
    )
    return L_post, h_post, cert
