"""Primitive association via unbalanced Sinkhorn OT over the stencil pool.

Parity map (reference operators/primitive_association.py:105-553):
  - cost C[i,k] = ||x_i - x_k||^2 + beta * Hellinger^2_vMF via Bhattacharyya
    of vMF natural params (A(k_m) - (A(k1)+A(k2))/2 with stable log-sinh);
  - recency cost bias epsilon * lambda * dt_scan (continuous, no gates);
  - deterministic top-K_ASSOC downselect by cost (top_k ties break by lowest
    pool index — the reference additionally tie-breaks on recency/primitive
    id, which only matters on exact cost ties);
  - fixed-K unbalanced Sinkhorn (tau_a/tau_b KL relaxation, K=50, no
    convergence check); responsibilities = pi directly (NO row
    normalization — row_masses carry novelty semantics, spec 5.7.3).

TPU-first deviation: candidates are scored against the WHOLE stencil pool
(N x S*M_VIEW cost tile — one big fused elementwise+reduce, MXU/VPU friendly)
instead of the reference's per-measurement hex-stencil re-lookup; the stencil
restriction is recovered by the distance term itself (candidates outside the
measurement's neighborhood lose by cost). Pool rows are masked by validity.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

from gcslam_tpu.utils.xla import jax, jnp, BELIEF_DTYPE, POINT_DTYPE
from gcslam_tpu import constants as C
from gcslam_tpu.models.batch import MeasurementBatch, mean_positions, mean_directions, kappas
from gcslam_tpu.ops.certs import Cert, make_cert, TRIGGERS


class AssociationResult(NamedTuple):
    responsibilities: jnp.ndarray  # (N, K)
    cand_pool: jnp.ndarray  # (N, K) int32 pool rows
    row_masses: jnp.ndarray  # (N,)
    cost: jnp.ndarray  # (N, K)
    transport_mass: jnp.ndarray  # ()
    marginal_defect_a: jnp.ndarray  # ()
    ess_ot: jnp.ndarray  # ()


def _log_A_vmf(k: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """A(k) = log(4 pi) + log(sinh k) - log k, numerically stable."""
    k = jnp.maximum(k, eps)
    log_sinh = jnp.where(
        k > 20.0,
        k - jnp.log(2.0),
        jnp.where(k >= 1e-2, jnp.log(jnp.sinh(k)), jnp.log(k + k**3 / 6.0)),
    )
    return jnp.log(4.0 * jnp.pi) + log_sinh - jnp.log(k)


def _sinkhorn_unbalanced(C_mat, a, b, epsilon, tau_a, tau_b, n_iters: int):
    eps = jnp.maximum(epsilon, 1e-12)
    K_mat = jnp.exp(-C_mat / eps)
    ua = 1.0 / (1.0 + tau_a / eps)
    vb = 1.0 / (1.0 + tau_b / eps)

    def it(_, uv):
        u, v = uv
        u = (a / (K_mat @ v + 1e-12)) ** ua
        v = (b / (K_mat.T @ u + 1e-12)) ** vb
        return u, v

    u0 = jnp.ones_like(a)
    v0 = jnp.ones_like(b)
    u, v = jax.lax.fori_loop(0, n_iters, it, (u0, v0))
    return u[:, None] * K_mat * v[None, :]


def associate_primitives_ot(
    batch: MeasurementBatch,
    view,  # AtlasView
    scan_seq: jnp.ndarray,
    cfg,
    z_lin_pose: jnp.ndarray = None,  # (6,) world pose; None if batch is world
) -> Tuple[AssociationResult, Cert]:
    f = BELIEF_DTYPE
    N = batch.valid.shape[0]
    K = cfg.k_assoc

    meas_pos = mean_positions(batch, cfg.eps_lift)  # (N, 3) body frame
    meas_dir = mean_directions(batch, cfg.eps_mass)
    meas_kap = kappas(batch)
    valid_f = batch.valid.astype(f)
    if z_lin_pose is not None:
        # Measurements live in the scan-end body frame; the view pool is
        # world-frame. Transport both position and direction through the
        # linearization pose (reference primitive_association.py:241-258
        # does this per-candidate inside its stencil loop).
        from gcslam_tpu.ops import se3 as _se3

        R0 = _se3.so3_exp(z_lin_pose[3:6])
        meas_pos = meas_pos @ R0.T + z_lin_pose[:3][None, :]
        meas_dir = meas_dir @ R0.T

    # --- full-pool cost tile (f32 for the big part) ----------------------
    p32 = POINT_DTYPE
    mp = meas_pos.astype(p32)
    vp = view.positions.astype(p32)
    d_pos = (
        jnp.sum(mp * mp, axis=1)[:, None]
        - 2.0 * mp @ vp.T
        + jnp.sum(vp * vp, axis=1)[None, :]
    )  # (N, P)

    meas_eta = (meas_kap[:, None] * meas_dir).astype(p32)  # (N, 3)
    view_eta = (view.kappas[:, None] * view.directions).astype(p32)  # (P, 3)
    # k_m = 0.5 ||eta_i + eta_k||: expand the norm to keep it matmul-shaped.
    cross = meas_eta @ view_eta.T  # (N, P)
    km = 0.5 * jnp.sqrt(
        jnp.maximum(
            jnp.sum(meas_eta**2, axis=1)[:, None]
            + jnp.sum(view_eta**2, axis=1)[None, :]
            + 2.0 * cross,
            1e-24,
        )
    )
    A_km = _log_A_vmf(km)
    A_k1 = _log_A_vmf(jnp.maximum(meas_kap.astype(p32), 1e-12))[:, None]
    A_k2 = _log_A_vmf(jnp.maximum(view.kappas.astype(p32), 1e-12))[None, :]
    bc = jnp.exp(A_km - 0.5 * (A_k1 + A_k2))
    d_dir = jnp.maximum(0.0, 1.0 - bc)
    dir_on = ((meas_kap[:, None] > 0) & (view.kappas[None, :] > 0)).astype(p32)
    cost_pool = d_pos + cfg.ot_cost_beta * d_dir * dir_on

    # Recency bias + validity mask.
    dt = jnp.maximum(0, scan_seq.astype(jnp.int32) - view.last_supported).astype(p32)
    cost_pool = cost_pool + cfg.ot_epsilon * cfg.recency_decay_lambda * dt[None, :]
    # Locality gate: the reference restricts candidates to the hex-stencil
    # tiles around each MEASUREMENT (primitive_association.py:307-365) — that
    # restriction is what gives unmatched measurements zero transported mass
    # (novelty -> insertion). Reproduce it as an absolute distance cutoff at
    # the stencil reach (2 tiles).
    reach_sq = (2.0 * cfg.h_tile * (cfg.r_stencil_xy + 0.5)) ** 2
    pool_ok = view.valid[None, :] & batch.valid[:, None] & (d_pos < reach_sq)
    cost_pool = jnp.where(pool_ok, cost_pool, 1e12)

    # --- deterministic top-K candidates ------------------------------------
    neg_top, cand = jax.lax.top_k(-cost_pool, K)  # (N, K)
    cost = (-neg_top).astype(f)
    cand = cand.astype(jnp.int32)

    # Optional row-min subtraction (reference cost normalization,
    # primitive_association.py:401-404; off by default — see PipelineConfig),
    # re-masking invalid/out-of-reach candidates afterwards so the
    # subtraction can never zero a masked entry.
    cand_valid = jnp.take_along_axis(pool_ok, cand, axis=1)
    if cfg.ot_subtract_row_min:
        row_min = jnp.min(jnp.where(cand_valid, cost, jnp.inf), axis=1, keepdims=True)
        row_min = jnp.where(jnp.isfinite(row_min), row_min, 0.0)
        cost_n = jnp.where(cand_valid, cost - row_min, 1e12)
    else:
        cost_n = jnp.where(cand_valid, cost, 1e12)

    # --- marginals (UNIFORM policies, spec 5.7.2) ---------------------------
    sum_a = jnp.maximum(jnp.sum(valid_f), cfg.eps_mass)
    a = valid_f / sum_a
    b = jnp.full((K,), 1.0 / K, dtype=f)

    pi = _sinkhorn_unbalanced(cost_n, a, b, cfg.ot_epsilon, cfg.ot_tau_a, cfg.ot_tau_b, cfg.k_sinkhorn)
    pi = pi * cand_valid.astype(f)
    row_masses = jnp.sum(pi, axis=1)

    transport_mass = jnp.sum(pi)
    marginal_defect_a = jnp.linalg.norm(row_masses - a)
    ess_ot = jnp.sum(row_masses) ** 2 / (jnp.sum(row_masses**2) + cfg.eps_mass)

    result = AssociationResult(
        responsibilities=pi,
        cand_pool=cand,
        row_masses=row_masses,
        cost=cost_n,
        transport_mass=transport_mass,
        marginal_defect_a=marginal_defect_a,
        ess_ot=ess_ot,
    )
    cert = make_cert(
        exact=False,
        triggers=TRIGGERS["sinkhorn_fixed_iter"] | TRIGGERS["sinkhorn_unbalanced_kl_relax"],
        ess_total=ess_ot,
        support_frac=jnp.sum(valid_f) / N,
        mass_epsilon_ratio=cfg.eps_mass / (transport_mass + cfg.eps_mass),
    )
    return result, cert
