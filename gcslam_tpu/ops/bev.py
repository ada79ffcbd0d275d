"""BEV15 pushforward view layer (reference common/bev_pushforward.py:42-119;
inactive in the reference runtime, preserved here as a jittable view module
for the splat-rendering/diagnostic path).

- 3D Gaussian -> 2D bird's-eye Gaussian pushforward under an oblique
  projection P (2x3): mu2 = P mu, Sigma2 = P Sigma P^T.
- 15 view projections swept along a geodesic in tilt angle between top-down
  and a maximally-oblique view.
- vMF natural-parameter rotation into each view frame.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from gcslam_tpu.utils.xla import jnp
from gcslam_tpu.ops import se3

N_VIEWS = 15


def view_projections(n_views: int = N_VIEWS, max_tilt: float = np.pi / 3) -> np.ndarray:
    """(n_views, 2, 3) oblique BEV projections: tilt swept 0..max_tilt around
    the x-axis (static table; built once)."""
    out = np.zeros((n_views, 2, 3))
    for i in range(n_views):
        tilt = max_tilt * i / max(n_views - 1, 1)
        c, s = np.cos(tilt), np.sin(tilt)
        # project onto the plane spanned by x and (cos t) y + (sin t) z
        out[i, 0] = [1.0, 0.0, 0.0]
        out[i, 1] = [0.0, c, s]
    return out


def pushforward_gaussians(
    mu: jnp.ndarray,  # (N, 3)
    Sigma: jnp.ndarray,  # (N, 3, 3)
    P: jnp.ndarray,  # (V, 2, 3) projections
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (mu2 (V, N, 2), Sigma2 (V, N, 2, 2))."""
    mu2 = jnp.einsum("vij,nj->vni", P, mu)
    Sigma2 = jnp.einsum("vij,njk,vlk->vnil", P, Sigma, P)
    return mu2, Sigma2


def rotate_vmf_etas(etas: jnp.ndarray, rotvec: jnp.ndarray) -> jnp.ndarray:
    """Rotate multi-lobe vMF natural params into a view frame:
    eta' = R eta (reference bev_pushforward.py:91)."""
    R = se3.so3_exp(rotvec)
    return jnp.einsum("ij,nbj->nbi", R, etas)
