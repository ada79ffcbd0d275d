"""MeasurementBatch: fixed-size SoA of measurement primitives.

Camera splats occupy rows [0, N_FEAT); LiDAR surfels [N_FEAT, N_FEAT+N_SURFEL)
(reference backend/structures/measurement_batch.py:69-157). Natural-parameter
discipline: Gaussians stored as (Lambda, theta); vMF as multi-lobe etas
(resultant = sum over lobes). All rows always exist; `valid` masks padding.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

from gcslam_tpu.utils.xla import jax, jnp, BELIEF_DTYPE
from gcslam_tpu import constants as C


class MeasurementBatch(NamedTuple):
    Lambdas: jnp.ndarray  # (N_total, 3, 3)
    thetas: jnp.ndarray  # (N_total, 3)
    etas: jnp.ndarray  # (N_total, B, 3)
    weights: jnp.ndarray  # (N_total,)
    sources: jnp.ndarray  # (N_total,) int32: 0=camera, 1=lidar
    valid: jnp.ndarray  # (N_total,) bool
    timestamps: jnp.ndarray  # (N_total,)
    colors: jnp.ndarray  # (N_total, 3)


def mean_positions(b: MeasurementBatch, eps_lift: float = C.EPS_LIFT) -> jnp.ndarray:
    from gcslam_tpu.ops import linalg

    return linalg.solve3x3(b.Lambdas, b.thetas, eps=eps_lift)


def mean_directions(b: MeasurementBatch, eps_mass: float = C.EPS_MASS) -> jnp.ndarray:
    eta = jnp.sum(b.etas, axis=-2)
    n = jnp.linalg.norm(eta, axis=-1, keepdims=True)
    return eta / (n + eps_mass)


def kappas(b: MeasurementBatch) -> jnp.ndarray:
    return jnp.linalg.norm(jnp.sum(b.etas, axis=-2), axis=-1)


def from_camera_and_surfels(
    cam_Lambdas: jnp.ndarray,
    cam_thetas: jnp.ndarray,
    cam_etas: jnp.ndarray,
    cam_weights: jnp.ndarray,
    cam_colors: jnp.ndarray,
    cam_valid: jnp.ndarray,
    cam_stamp: jnp.ndarray,
    surf_positions: jnp.ndarray,  # (N_SURFEL, 3)
    surf_Lambdas: jnp.ndarray,  # (N_SURFEL, 3, 3) info-form precisions
    surf_normals: jnp.ndarray,  # (N_SURFEL, 3)
    surf_kappas: jnp.ndarray,  # (N_SURFEL,)
    surf_weights: jnp.ndarray,  # (N_SURFEL,)
    surf_stamps: jnp.ndarray,  # (N_SURFEL,)
    surf_valid: jnp.ndarray,  # (N_SURFEL,) bool
) -> MeasurementBatch:
    """Assemble the unified batch: camera slice passthrough + LiDAR slice from
    surfel outputs. LiDAR colors default to grayscale from normal.z (visible,
    never black — measurement_batch.py:262-270)."""
    f = BELIEF_DTYPE
    n_feat = cam_Lambdas.shape[0]
    n_surf = surf_positions.shape[0]
    B = C.VMF_N_LOBES

    thetas_l = jnp.einsum("nij,nj->ni", surf_Lambdas, surf_positions)
    etas_l = jnp.zeros((n_surf, B, 3), dtype=f).at[:, 0, :].set(
        surf_kappas[:, None] * surf_normals
    )
    nz = jnp.clip(surf_normals[:, 2:3], -1.0, 1.0)
    gray = 0.25 + 0.5 * (nz + 1.0) / 2.0
    colors_l = jnp.broadcast_to(gray, (n_surf, 3))

    Lambdas = jnp.concatenate([cam_Lambdas.astype(f), surf_Lambdas.astype(f)], axis=0)
    thetas = jnp.concatenate([cam_thetas.astype(f), thetas_l], axis=0)
    etas = jnp.concatenate([cam_etas.astype(f), etas_l], axis=0)
    weights = jnp.concatenate([cam_weights.astype(f), surf_weights.astype(f)], axis=0)
    sources = jnp.concatenate(
        [jnp.zeros((n_feat,), dtype=jnp.int32), jnp.ones((n_surf,), dtype=jnp.int32)]
    )
    valid = jnp.concatenate([cam_valid, surf_valid], axis=0)
    stamps = jnp.concatenate(
        [jnp.broadcast_to(cam_stamp, (n_feat,)).astype(f), surf_stamps.astype(f)], axis=0
    )
    colors = jnp.concatenate([cam_colors.astype(f), colors_l], axis=0)
    # zero out invalid rows so downstream sums never see padding values
    vm = valid.astype(f)
    return MeasurementBatch(
        Lambdas=Lambdas * vm[:, None, None],
        thetas=thetas * vm[:, None],
        etas=etas * vm[:, None, None],
        weights=weights * vm,
        sources=sources,
        valid=valid,
        timestamps=stamps,
        colors=colors,
    )
