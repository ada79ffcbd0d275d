"""Pallas TPU kernel: tiled Gaussian-splat rasterizer.

The reference renderer (and outputs/rendering.py's jnp fallback) composites
splats front-to-back with a scan over primitives — P sequential passes over
the full image in HBM. This kernel tiles the image over the Pallas grid and
keeps each tile's accumulators in VMEM: one pass over the splat list per
tile, predicated on a 3-sigma footprint/tile intersection test, so HBM
traffic is O(image + splats) instead of O(image * splats).

Inputs are the depth-sorted per-splat screen parameters produced by
`prepare_screen_splats` (shared with the jnp path — projection math is
identical; only the rasterization loop differs).
"""

from __future__ import annotations

import functools
from typing import Tuple

from gcslam_tpu.utils.xla import jax, jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 128
TILE_W = 128


def _raster_kernel(u0_ref, v0_ref, inv2_ref, rgb_ref, alpha_ref, z_ref, r3_ref,
                   rgb_out, depth_out, trans_out, *, n_splats: int, log_clip: float):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    y0 = (ti * TILE_H).astype(jnp.float32)
    x0 = (tj * TILE_W).astype(jnp.float32)

    vs = y0 + jax.lax.broadcasted_iota(jnp.float32, (TILE_H, TILE_W), 0)
    us = x0 + jax.lax.broadcasted_iota(jnp.float32, (TILE_H, TILE_W), 1)

    rgb_out[...] = jnp.zeros((TILE_H, TILE_W, 3), jnp.float32)
    depth_out[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    trans_out[...] = jnp.ones((TILE_H, TILE_W), jnp.float32)

    def body(p, _):
        u_s = u0_ref[p]
        v_s = v0_ref[p]
        r3 = r3_ref[p]  # 3-sigma screen radius

        # footprint/tile intersection (predicated skip)
        hit = (
            (u_s + r3 >= x0)
            & (u_s - r3 <= x0 + TILE_W)
            & (v_s + r3 >= y0)
            & (v_s - r3 <= y0 + TILE_H)
            & (alpha_ref[p] > 0.0)
        )

        @pl.when(hit)
        def _():
            du = us - u_s
            dv = vs - v_s
            a = inv2_ref[p, 0]
            b = inv2_ref[p, 1]
            c = inv2_ref[p, 2]
            q = -0.5 * (a * du * du + 2.0 * b * du * dv + c * dv * dv)
            w = jnp.where(q > log_clip, jnp.exp(q), 0.0) * alpha_ref[p]
            t_acc = trans_out[...]
            contrib = w * t_acc
            col = rgb_ref[p]  # (3,)
            acc = rgb_out[...]
            rgb_out[...] = acc + contrib[..., None] * col[None, None, :]
            depth_out[...] = depth_out[...] + contrib * z_ref[p]
            trans_out[...] = t_acc * (1.0 - w)

        return _

    jax.lax.fori_loop(0, n_splats, lambda p, c: (body(p, c), c)[1], 0)


def prepare_screen_splats(mu_world, Sigma_world, etas, colors, masses, cam_pose, params):
    """Shared projection/shading math (same as outputs/rendering.py); returns
    depth-sorted per-splat screen params: u0, v0, inv2(a,b,c), rgb, alpha, z, r3sig."""
    from gcslam_tpu.outputs import rendering as R
    from gcslam_tpu.ops import se3

    f32 = jnp.float32
    R_wc = se3.so3_exp(cam_pose[3:6].astype(f32))
    t_wc = cam_pose[:3].astype(f32)
    mu_c = (mu_world.astype(f32) - t_wc[None, :]) @ R_wc
    z = mu_c[:, 2]
    in_front = z > 0.1
    z_safe = jnp.maximum(z, 0.1)

    Sig_c = jnp.einsum("ji,pjk,kl->pil", R_wc, Sigma_world.astype(f32), R_wc)
    x, y = mu_c[:, 0], mu_c[:, 1]
    J = jnp.stack(
        [
            jnp.stack([params.fx / z_safe, jnp.zeros_like(z), -params.fx * x / z_safe**2], -1),
            jnp.stack([jnp.zeros_like(z), params.fy / z_safe, -params.fy * y / z_safe**2], -1),
        ],
        axis=-2,
    )
    Sig2 = jnp.einsum("pij,pjk,plk->pil", J, Sig_c, J) + 0.3 * jnp.eye(2, dtype=f32)
    det2 = jnp.maximum(Sig2[:, 0, 0] * Sig2[:, 1, 1] - Sig2[:, 0, 1] ** 2, 1e-12)
    inv2 = jnp.stack(
        [Sig2[:, 1, 1] / det2, -Sig2[:, 0, 1] / det2, Sig2[:, 0, 0] / det2], axis=-1
    )  # (P, 3) = a, b, c of the inverse
    u0 = params.fx * x / z_safe + params.width / 2.0
    v0 = params.fy * y / z_safe + params.height / 2.0
    # 3-sigma footprint radius from the larger 2D eigenvalue
    tr = Sig2[:, 0, 0] + Sig2[:, 1, 1]
    disc = jnp.sqrt(jnp.maximum((Sig2[:, 0, 0] - Sig2[:, 1, 1]) ** 2 + 4 * Sig2[:, 0, 1] ** 2, 0.0))
    lam_max = 0.5 * (tr + disc)
    r3 = 3.0 * jnp.sqrt(lam_max)

    view = mu_c / jnp.maximum(jnp.linalg.norm(mu_c, axis=-1, keepdims=True), 1e-6)
    view_w = view @ R_wc.T
    dots = jnp.einsum("pbi,pi->pb", etas.astype(f32), -view_w)
    kap = jnp.linalg.norm(etas.astype(f32), axis=-1)
    shade = 0.4 + 0.6 * jnp.clip(jnp.sum(jnp.exp(dots - kap), -1) / etas.shape[1], 0.0, 1.0)
    noise = R._fbm_value_noise(mu_world.astype(f32))
    rgb_p = jnp.clip(colors.astype(f32) * (1 + params.noise_amp * noise[:, None]), 0, 1) * shade[:, None]
    alpha = params.alpha_scale * masses.astype(f32) / (masses.astype(f32) + 1.0) * in_front

    order = jnp.argsort(z)
    return (u0[order], v0[order], inv2[order], rgb_p[order], alpha[order], z[order], r3[order])


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def render_splats_pallas(mu_world, Sigma_world, etas, colors, masses, cam_pose, params,
                         interpret: bool | None = None):
    """Tiled-rasterizer render -> (rgb (H, W, 3), depth (H, W)).

    interpret=None auto-selects Pallas interpreter mode off-TPU (tests)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    u0, v0, inv2, rgb_p, alpha, z, r3 = prepare_screen_splats(
        mu_world, Sigma_world, etas, colors, masses, cam_pose, params
    )
    P = u0.shape[0]
    H = ((params.height + TILE_H - 1) // TILE_H) * TILE_H
    W = ((params.width + TILE_W - 1) // TILE_W) * TILE_W
    grid = (H // TILE_H, W // TILE_W)

    kernel = functools.partial(_raster_kernel, n_splats=P, log_clip=params.log_clip)
    rgb, depth, trans = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 7,
        out_specs=(
            pl.BlockSpec((TILE_H, TILE_W, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H, W, 3), jnp.float32),
            jax.ShapeDtypeStruct((H, W), jnp.float32),
            jax.ShapeDtypeStruct((H, W), jnp.float32),
        ),
        interpret=interpret,
    )(u0, v0, inv2, rgb_p, alpha, z, r3)

    cover = jnp.maximum(1.0 - trans, 1e-6)
    rgb = jnp.clip(rgb[: params.height, : params.width], 0.0, 1.0)
    depth = (depth / cover)[: params.height, : params.width]
    return rgb, depth
