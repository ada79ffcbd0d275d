"""Splat export: the atlas as renderable Gaussian-splat arrays
(reference backend_node.py:2371-2457 multi-tile splat_export.npz)."""

from __future__ import annotations

import numpy as np

from gcslam_tpu.ops import linalg


def atlas_to_splats(atlas) -> dict:
    """Flatten valid primitives to export arrays:
    positions/covariances/precisions/etas/kappas/colors/masses/ids/tile_ids."""
    valid = np.asarray(atlas.valid)  # (T, M)
    T, M = valid.shape
    # Precision-collapsed primitives (Lambda decayed to ~underflow in tiles
    # that left the active stencil before the cull could run) carry no
    # information and their solved mu overflows — exclude them, mirroring
    # the in-graph LAMBDA_CULL_FLOOR (models/atlas._cull_forget).
    lam_diag = np.abs(np.diagonal(np.asarray(atlas.Lambdas), axis1=-2, axis2=-1))
    valid = valid & (lam_diag.max(axis=-1) > 1e-12)
    idx = np.argwhere(valid)
    ti, si = idx[:, 0], idx[:, 1]

    Lam = np.asarray(atlas.Lambdas)[ti, si].astype(np.float64)
    th = np.asarray(atlas.thetas)[ti, si].astype(np.float64)
    Sigma = np.asarray(linalg.inv3x3(Lam, eps=1e-9))
    mu = np.einsum("nij,nj->ni", Sigma, th)
    etas = np.asarray(atlas.etas)[ti, si].astype(np.float64)
    eta_sum = etas.sum(axis=1)
    kap = np.linalg.norm(eta_sum, axis=1)

    return {
        "mu_world": mu,
        "Sigma_world": Sigma,
        "Lambda_world": Lam,
        "etas": etas,
        "kappas": kap,
        "normals": eta_sum / np.maximum(kap[:, None], 1e-12),
        "colors": np.asarray(atlas.rgb)[ti, si].astype(np.float64),
        "masses": np.asarray(atlas.weights)[ti, si].astype(np.float64),
        "primitive_ids": np.asarray(atlas.primitive_ids)[ti, si],
        "tile_ids": np.asarray(atlas.tile_ids)[ti],
        "cam_mass": np.asarray(atlas.cam_mass)[ti, si].astype(np.float64),
        "lidar_mass": np.asarray(atlas.lidar_mass)[ti, si].astype(np.float64),
        "created": np.asarray(atlas.created)[ti, si].astype(np.float64),
        "last_supported_scan_seq": np.asarray(atlas.last_supported)[ti, si],
    }


def save_splat_export(path: str, atlas) -> int:
    data = atlas_to_splats(atlas)
    np.savez_compressed(path, **data)
    return int(data["mu_world"].shape[0])
