"""MA-Hex 3D tile addressing, fully in-graph.

Same addressing contract as the reference (common/tiling.py:32-209): hex axes
a1=(1,0), a2=(1/2, sqrt(3)/2) in XY, linear Z; cell = floor(s/h); packed
64-bit tile id with 21 bits/axis and a fixed bias (deterministic, unwrapped).
Stencils are static offset tables (hex disk x z-slab) applied to a center
cell inside jit.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from gcslam_tpu.utils.xla import jnp
from gcslam_tpu import constants as C

BITS_PER_AXIS = 21
BIAS = 1 << 20
MASK = (1 << BITS_PER_AXIS) - 1
SQRT3_2 = float(np.sqrt(3.0) / 2.0)


def hex_cells_from_xyz(xyz: jnp.ndarray, h_tile: float) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(..., 3) -> (c1, c2, cz) int64 MA-Hex 3D cell coords."""
    h = max(float(h_tile), 1e-12)
    s1 = xyz[..., 0]
    s2 = xyz[..., 0] * 0.5 + xyz[..., 1] * SQRT3_2
    c1 = jnp.floor(s1 / h).astype(jnp.int64)
    c2 = jnp.floor(s2 / h).astype(jnp.int64)
    cz = jnp.floor(xyz[..., 2] / h).astype(jnp.int64)
    return c1, c2, cz


def tile_ids_from_cells(c1: jnp.ndarray, c2: jnp.ndarray, cz: jnp.ndarray) -> jnp.ndarray:
    """Pack cell coords into a signed-int64 tile id (bias + mask per axis)."""
    b = jnp.int64(BIAS)
    m = jnp.int64(MASK)
    u1 = (c1 + b) & m
    u2 = (c2 + b) & m
    uz = (cz + b) & m
    return (u1 << (2 * BITS_PER_AXIS)) | (u2 << BITS_PER_AXIS) | uz


def tile_ids_from_xyz(xyz: jnp.ndarray, h_tile: float = C.H_TILE) -> jnp.ndarray:
    return tile_ids_from_cells(*hex_cells_from_xyz(xyz, h_tile))


def hex_disk_axial(radius: int) -> List[Tuple[int, int]]:
    """Axial coords of a radius-r hex disk, deterministic sorted order."""
    r = int(radius)
    out = []
    for q in range(-r, r + 1):
        for rr in range(max(-r, -q - r), min(r, -q + r) + 1):
            out.append((q, rr))
    out.sort()
    return out


def stencil_offsets(radius_xy: int, radius_z: int) -> np.ndarray:
    """(S, 3) static int64 offsets: z-slab outer, sorted hex disk inner
    (deterministic order matches the reference tiling.py:189-209)."""
    disk = hex_disk_axial(radius_xy)
    rows = []
    for dz in range(-int(radius_z), int(radius_z) + 1):
        for dq, dr in disk:
            rows.append((dq, dr, dz))
    return np.asarray(rows, dtype=np.int64)


def stencil_tile_ids(center_xyz: jnp.ndarray, radius_xy: int, radius_z: int, h_tile: float = C.H_TILE) -> jnp.ndarray:
    """(S,) int64 tile ids of the stencil around center_xyz — in-graph."""
    c1, c2, cz = hex_cells_from_xyz(center_xyz, h_tile)
    offs = jnp.asarray(stencil_offsets(radius_xy, radius_z))  # (S, 3) static
    return tile_ids_from_cells(c1 + offs[:, 0], c2 + offs[:, 1], cz + offs[:, 2])
