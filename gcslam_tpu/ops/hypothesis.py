"""Hypothesis barycenter projection (reference operators/hypothesis.py:1324-1509).

Combines the K_HYP vmapped beliefs into one publishable belief:
weight floor -> renormalize -> information barycenter -> PSD projection.
Inputs are the STACKED belief arrays produced by the vmapped scan step —
no list-of-objects, no Python loop.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

from gcslam_tpu.utils.xla import jax, jnp
from gcslam_tpu import constants as C
from gcslam_tpu.models.belief import Belief
from gcslam_tpu.ops import linalg
from gcslam_tpu.ops.certs import Cert, make_cert, TRIGGERS


class BarycenterOut(NamedTuple):
    belief: Belief
    weights_normalized: jnp.ndarray
    floor_adjustment: jnp.ndarray
    spread_proxy: jnp.ndarray


def hypothesis_barycenter(
    beliefs: Belief,  # stacked: fields have leading (K,) axis
    weights: jnp.ndarray,  # (K,)
    weight_floor: float = C.HYP_WEIGHT_FLOOR,
    eps_psd: float = C.EPS_PSD,
    eps_lift: float = C.EPS_LIFT,
) -> Tuple[BarycenterOut, Cert]:
    w_floored = jnp.maximum(weights, weight_floor)
    floor_adj = jnp.sum(jnp.abs(w_floored - weights))
    w = w_floored / jnp.sum(w_floored)

    L_out_raw = jnp.einsum("k,kij->ij", w, beliefs.L)
    h_out = jnp.einsum("k,ki->i", w, beliefs.h)
    z_lin_out = jnp.einsum("k,ki->i", w, beliefs.z_lin)
    L_out, pc = linalg.domain_projection_psd(L_out_raw, eps_psd)

    # Spread proxy: weighted variance of per-hypothesis means.
    mu_k, _ = linalg.spd_solve_lifted(beliefs.L, beliefs.h, eps_lift)  # (K, 22)
    mean_of_means = jnp.einsum("k,ki->i", w, mu_k)
    spread = jnp.einsum("k,k->", w, jnp.sum((mu_k - mean_of_means) ** 2, axis=-1))

    belief_out = Belief(
        X_anchor=beliefs.X_anchor[0],
        z_lin=z_lin_out,
        L=L_out,
        h=h_out,
        stamp=beliefs.stamp[0],
    )
    cert = make_cert(
        exact=False,
        triggers=TRIGGERS["HypothesisProjection"],
        eig_min=pc.eig_min,
        eig_max=pc.eig_max,
        cond=pc.cond,
        near_null_count=pc.near_null_count,
        ess_total=1.0 / jnp.sum(w * w),
        support_frac=jnp.sum(w > weight_floor) / w.shape[0],
        psd_projection_delta=pc.projection_delta,
        mass_epsilon_ratio=floor_adj / w.shape[0],
    )
    return BarycenterOut(
        belief=belief_out, weights_normalized=w, floor_adjustment=floor_adj, spread_proxy=spread
    ), cert
