"""Pose recompose (Frobenius-blended BCH3 chart shift) + continuous anchor
drift.

Parity map:
  - pose_update_frobenius_recompose: reference operators/recompose.py:693-848.
      s = mag / (mag + c_frob); delta' = delta + s * 1/2 [z_lin_pose, delta];
      X_new = X_anchor ∘ Exp(delta'); chart shift z' = z - shift,
      h' = h - L shift (pose slice only).
  - anchor_drift_update: operators/anchor_drift.py:1175-1272.
      rho = clip(max(|dt|/M0, |dr|/R0), 0, 1); anchor absorbs rho of the
      increment; z_lin' = (1 - rho) dz; h' = L z_lin'.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

from gcslam_tpu.utils.xla import jnp
from gcslam_tpu import constants as C
from gcslam_tpu.models.belief import Belief, mean_increment
from gcslam_tpu.ops import se3
from gcslam_tpu.ops.certs import Cert, make_cert, TRIGGERS


def bch3_correction(xi1: jnp.ndarray, xi2: jnp.ndarray) -> jnp.ndarray:
    """0.5 [xi1, xi2] for se(3) twists in [trans, rot] ordering."""
    v1, w1 = xi1[..., :3], xi1[..., 3:6]
    v2, w2 = xi2[..., :3], xi2[..., 3:6]
    omega_cross = jnp.cross(w1, w2)
    v_cross = jnp.cross(w1, v2) + jnp.cross(v1, w2)
    return 0.5 * jnp.concatenate([v_cross, omega_cross], axis=-1)


class RecomposeOut(NamedTuple):
    belief: Belief
    delta_pose: jnp.ndarray  # (6,) corrected pose increment
    frobenius_strength: jnp.ndarray


def pose_update_frobenius_recompose(
    belief_post: Belief,
    total_trigger_magnitude: jnp.ndarray,
    c_frob: float = C.C_FROB,
    eps_lift: float = C.EPS_LIFT,
) -> Tuple[RecomposeOut, Cert]:
    delta_z = mean_increment(belief_post, eps_lift)
    delta_pose = delta_z[C.IDX_POSE]

    strength = total_trigger_magnitude / (total_trigger_magnitude + c_frob)
    correction = bch3_correction(belief_post.z_lin[C.IDX_POSE], delta_pose)
    delta_corrected = delta_pose + strength * correction

    X_new = se3.se3_compose(belief_post.X_anchor, se3.se3_exp(delta_corrected))

    shift = jnp.zeros(C.D_Z, dtype=belief_post.z_lin.dtype).at[C.IDX_POSE].set(delta_corrected)
    z_lin_new = belief_post.z_lin - shift
    h_new = belief_post.h - belief_post.L @ shift

    cert = make_cert(
        exact=False,
        triggers=TRIGGERS["PoseUpdateFrobeniusRecompose"],
        frobenius_applied=(strength > jnp.finfo(strength.dtype).eps).astype(strength.dtype),
    )
    belief_new = Belief(
        X_anchor=X_new, z_lin=z_lin_new, L=belief_post.L, h=h_new, stamp=belief_post.stamp
    )
    return RecomposeOut(belief=belief_new, delta_pose=delta_corrected, frobenius_strength=strength), cert


class AnchorDriftOut(NamedTuple):
    belief: Belief
    rho: jnp.ndarray
    drift_m: jnp.ndarray
    drift_r: jnp.ndarray


def anchor_drift_update(
    b: Belief,
    M0: float = C.ANCHOR_DRIFT_M0,
    R0: float = C.ANCHOR_DRIFT_R0,
    eps_lift: float = C.EPS_LIFT,
) -> Tuple[AnchorDriftOut, Cert]:
    delta_z = mean_increment(b, eps_lift)
    delta_pose = delta_z[C.IDX_POSE]
    drift_m = jnp.linalg.norm(delta_pose[:3])
    drift_r = jnp.linalg.norm(delta_pose[3:6])
    rho = jnp.clip(jnp.maximum(drift_m / M0, drift_r / R0), 0.0, 1.0)

    X_new = se3.se3_compose(b.X_anchor, se3.se3_exp(rho * delta_pose))
    z_lin_new = (1.0 - rho) * delta_z
    h_new = b.L @ z_lin_new

    cert = make_cert(exact=False, triggers=TRIGGERS["AnchorDriftUpdate"], anchor_drift_rho=rho)
    out = AnchorDriftOut(
        belief=Belief(X_anchor=X_new, z_lin=z_lin_new, L=b.L, h=h_new, stamp=b.stamp),
        rho=rho,
        drift_m=drift_m,
        drift_r=drift_r,
    )
    return out, cert
