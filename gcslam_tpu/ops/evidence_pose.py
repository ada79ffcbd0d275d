"""Primitive-alignment pose evidence (steps 7-8 output): the LiDAR/camera
pose factor from OT soft correspondences.

Parity map (reference operators/visual_pose_evidence.py:662-1024):
  - translation: weighted least squares over (meas, candidate) pairs,
        L_t = sum pi_ik Lambda_i,  residual r_ik = m_k - R p_i - t;
  - rotation: responsibility-weighted scatter S = sum pi sqrt(kappa kappa')
        m_hat_w m_hat_b^T, SVD -> nearest rotation, Laplace information.

Deviations (correctness; certified as 'linearization' triggers):
  - the information/vector pair is expressed in the CHART tangent frame
    (right perturbation X = X0 Exp(dxi)): for translation the residual is
    rotated into the body/anchor frame, where the transported precision
    R^T (R Lambda_b R^T) R = Lambda_b — so L_t keeps the reference's exact
    form while h_t gains the missing R^T and -t0 terms
    (the reference's h omits both, visual_pose_evidence.py:717-722);
  - rotation information uses the exact Matrix-Fisher Laplace
    H = V (tr(D) I - D) V^T at the SVD mode instead of diag(singular values)
    in the wrong basis, and the residual is the right-perturbation
    Log(R0^T R*) instead of the left one.
"""

from __future__ import annotations

from typing import Tuple

from gcslam_tpu.utils.xla import jnp, BELIEF_DTYPE
from gcslam_tpu import constants as C
from gcslam_tpu.models.batch import MeasurementBatch, mean_positions, mean_directions, kappas
from gcslam_tpu.ops import linalg, se3
from gcslam_tpu.ops.certs import Cert, make_cert, TRIGGERS


def primitive_pose_evidence(
    assoc,  # AssociationResult
    batch: MeasurementBatch,
    view,  # AtlasView
    z_lin_pose: jnp.ndarray,  # (6,) world pose linearization point
    cfg,
) -> Tuple[jnp.ndarray, jnp.ndarray, Cert]:
    f = BELIEF_DTYPE
    t0 = z_lin_pose[:3]
    R0 = se3.so3_exp(z_lin_pose[3:6])

    meas_pos = mean_positions(batch, cfg.eps_lift)  # (N, 3) body
    meas_dir = mean_directions(batch, cfg.eps_mass)
    meas_kap = kappas(batch)
    Lam_b = batch.Lambdas + cfg.eps_lift * jnp.eye(3, dtype=f)  # body precisions
    if getattr(cfg, "pose_point_to_plane", True):
        # Point-to-plane information for SURFELS (sources==1): project the
        # precision onto the surfel normal, Lambda_eff = (n^T Lambda n) n n^T.
        # A planar surfel carries NO in-plane alignment information; the
        # reference's full-Lambda WLS (visual_pose_evidence.py:712-714) sums
        # the spurious in-plane precision over hundreds of pairs and drags
        # the estimate toward stale map offsets (aperture problem). Camera
        # splats (sources==0) keep their full 3D precision.
        n_hat = meas_dir  # surfel normal = vMF mean direction
        lam_n = jnp.einsum("ni,nij,nj->n", n_hat, Lam_b, n_hat)
        Lam_plane = lam_n[:, None, None] * n_hat[:, :, None] * n_hat[:, None, :]
        is_surfel = (batch.sources == 1)[:, None, None]
        Lam_b = jnp.where(is_surfel, Lam_plane + cfg.eps_lift * jnp.eye(3, dtype=f), Lam_b)

    pi = assoc.responsibilities * (batch.valid[:, None] & view.valid[assoc.cand_pool]).astype(f)
    map_pos = view.positions[assoc.cand_pool]  # (N, K, 3) world
    map_dir = view.directions[assoc.cand_pool]
    map_kap = view.kappas[assoc.cand_pool]

    # Continuous Cauchy robustification of pair residuals (no gates): soft
    # OT leaves a few % of mass on wrong candidates whose meter-scale
    # residuals would otherwise pollute the WLS target. w = 1/(1+|r|^2/r0^2).
    r0_sq = (0.3) ** 2
    meas_world_pre = meas_pos @ R0.T + t0[None, :]
    pair_r = map_pos - meas_world_pre[:, None, :]
    w_robust = 1.0 / (1.0 + jnp.sum(pair_r * pair_r, axis=-1) / r0_sq)
    # Map-maturity weighting (continuous): a freshly-seeded primitive (mass
    # ~novelty*w ~ 1e-2) carries almost no alignment authority; a repeatedly
    # fused one (mass >> 1) carries full weight. Prevents the sparse early
    # map from yanking the pose before it has converged.
    w_mature = view.weights[assoc.cand_pool] / (view.weights[assoc.cand_pool] + 1.0)
    pi = pi * w_robust * w_mature

    # ---- translation WLS in the chart tangent -----------------------------
    # r_tangent_ik = R0^T (m_k - R0 p_i - t0); dr/d(rho) = -I =>
    # L = sum pi Lambda_b (exact: R0^T Lambda_w R0 = Lambda_b),
    # h = sum_i Lambda_b,i @ (sum_k pi_ik r_ik).
    pi_sum_k = jnp.sum(pi, axis=1)  # (N,)
    L_trans = jnp.einsum("n,nij->ij", pi_sum_k, Lam_b)
    meas_world = meas_pos @ R0.T  # R0 p_i, (N, 3)
    r_world = map_pos - meas_world[:, None, :] - t0[None, None, :]  # (N, K, 3)
    r_tan = jnp.einsum("ji,nkj->nki", R0, r_world)  # R0^T r
    r_weighted = jnp.einsum("nk,nki->ni", pi, r_tan)
    h_trans = jnp.einsum("nij,nj->i", Lam_b, r_weighted)
    trans_cost = jnp.einsum("nki,nij,nkj->", r_tan * pi[..., None], Lam_b, r_tan)

    L_trans = L_trans + cfg.eps_lift * jnp.eye(3, dtype=f)

    # ---- rotation: Matrix-Fisher Laplace at the scatter mode ---------------
    kw = jnp.sqrt(meas_kap[:, None] * map_kap + 1e-12) * pi  # (N, K)
    S = jnp.einsum("nk,nki,nj->ij", kw, map_dir, meas_dir)  # world x body scatter
    R_star, D, V = linalg.rotation_from_scatter(S)  # eigh-based (f64 on TPU)
    # Laplace information of tr(S^T R) at R = R_star Exp(dtheta):
    # H = V (tr(D) I - D) V^T.
    H_diag = jnp.sum(D) - D
    L_rot = V @ (H_diag[:, None] * V.T)
    L_rot, pc = linalg.domain_projection_psd(linalg.sym(L_rot), cfg.eps_psd)
    L_rot = L_rot + cfg.eps_lift * jnp.eye(3, dtype=f)

    # right-perturbation residual toward the scatter mode
    rot_resid = se3.so3_log(R0.T @ R_star)
    h_rot = L_rot @ rot_resid

    rot_cost = jnp.sum(kw * (1.0 - jnp.einsum("ni,nki->nk", meas_dir @ R0.T, map_dir)))

    # ---- embed into 22D -----------------------------------------------------
    L = cfg.eps_lift * jnp.eye(C.D_Z, dtype=f)
    h = jnp.zeros((C.D_Z,), dtype=f)
    L = L.at[C.IDX_TRANS, C.IDX_TRANS].set(L_trans).at[C.IDX_ROT, C.IDX_ROT].set(L_rot)
    h = h.at[C.IDX_TRANS].set(h_trans).at[C.IDX_ROT].set(h_rot)

    ess = jnp.sum(assoc.row_masses)
    cert = make_cert(
        exact=False,
        triggers=TRIGGERS["linearization"] | TRIGGERS["ot_soft_correspondence"],
        frobenius_applied=1.0,
        ess_total=ess,
        support_frac=jnp.sum(batch.valid.astype(f)) / batch.valid.shape[0],
        nll_per_ess=(trans_cost + rot_cost) / (ess + cfg.eps_mass),
        lift_strength=cfg.eps_lift,
    )
    return L, h, cert
