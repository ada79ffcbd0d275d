"""Gaussian-splat renderer: EWA elliptical splatting with multi-lobe vMF
view-dependent shading — ON the TPU.

Functional parity with the reference's output-side renderer
(backend/rendering.py:52-355):
  - EWA: each primitive's 3D Gaussian is pushed through the camera into a
    2D covariance; pixels weighted by exp(-0.5 d^T Sigma2d^{-1} d) with
    log-domain clipping;
  - multi-lobe vMF shading I(v) ∝ sum_b exp(eta_b . v) — explicitly NO
    spherical harmonics (rendering.py:117);
  - world-space fBm value noise for stable surface texture
    (rendering.py:167-235);
  - depth-sorted alpha compositing.

TPU-first design: instead of the reference's per-tile Python binning with
fixed caps (rendering.py:252-340), the renderer evaluates a (pixels x
primitives) weight tile in chunks — pure fused VPU work under jit — and
composites front-to-back with a segmented scan. Good for the map sizes the
atlas holds (<= tens of thousands of splats).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

from gcslam_tpu.utils.xla import jax, jnp, POINT_DTYPE
from gcslam_tpu.ops import se3, linalg


class RenderParams(NamedTuple):
    width: int = 320
    height: int = 240
    fx: float = 240.0
    fy: float = 240.0
    alpha_scale: float = 0.8
    noise_amp: float = 0.15
    log_clip: float = -8.0  # exp(-8) footprint cutoff (log-domain clipping)


def _fbm_value_noise(p: jnp.ndarray, octaves: int = 3) -> jnp.ndarray:
    """World-space fBm value noise (stable texture; rendering.py:167-235):
    hash-gradient-free value noise from a smooth lattice hash."""
    out = jnp.zeros(p.shape[:-1], dtype=p.dtype)
    amp = 1.0
    freq = 2.0
    for _ in range(octaves):
        q = p * freq
        qi = jnp.floor(q)
        qf = q - qi
        # smooth lattice hash -> value in [0, 1]
        def h(c):
            s = c[..., 0] * 127.1 + c[..., 1] * 311.7 + c[..., 2] * 74.7
            return jnp.abs(jnp.sin(s) * 43758.5453) % 1.0

        w = qf * qf * (3.0 - 2.0 * qf)  # smoothstep
        v = 0.0
        for dx in (0.0, 1.0):
            for dy in (0.0, 1.0):
                for dz in (0.0, 1.0):
                    corner = qi + jnp.stack(
                        [jnp.full_like(qf[..., 0], dx),
                         jnp.full_like(qf[..., 0], dy),
                         jnp.full_like(qf[..., 0], dz)], -1)
                    wx = w[..., 0] if dx else (1 - w[..., 0])
                    wy = w[..., 1] if dy else (1 - w[..., 1])
                    wz = w[..., 2] if dz else (1 - w[..., 2])
                    v = v + h(corner) * wx * wy * wz
        out = out + amp * (v - 0.5)
        amp *= 0.5
        freq *= 2.0
    return out


@partial(jax.jit, static_argnames=("params",))
def render_splats(
    mu_world: jnp.ndarray,  # (P, 3)
    Sigma_world: jnp.ndarray,  # (P, 3, 3)
    etas: jnp.ndarray,  # (P, B, 3) vMF lobes
    colors: jnp.ndarray,  # (P, 3)
    masses: jnp.ndarray,  # (P,)
    cam_pose: jnp.ndarray,  # (6,) camera->world [trans, rotvec]
    params: RenderParams = RenderParams(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (rgb (H, W, 3), depth (H, W)). Differentiable, jittable, TPU-run."""
    f32 = POINT_DTYPE
    H, W = params.height, params.width
    cx, cy = W / 2.0, H / 2.0
    R_wc = se3.so3_exp(cam_pose[3:6].astype(f32))
    t_wc = cam_pose[:3].astype(f32)

    # world -> camera
    mu_c = (mu_world.astype(f32) - t_wc[None, :]) @ R_wc  # (P, 3)
    z = mu_c[:, 2]
    in_front = z > 0.1
    z_safe = jnp.maximum(z, 0.1)

    # EWA: project the 3D covariance through the pinhole Jacobian
    Sig_c = jnp.einsum("ji,pjk,kl->pil", R_wc, Sigma_world.astype(f32), R_wc)
    x, y = mu_c[:, 0], mu_c[:, 1]
    J = jnp.stack(
        [
            jnp.stack([params.fx / z_safe, jnp.zeros_like(z), -params.fx * x / z_safe**2], -1),
            jnp.stack([jnp.zeros_like(z), params.fy / z_safe, -params.fy * y / z_safe**2], -1),
        ],
        axis=-2,
    )  # (P, 2, 3)
    Sig2 = jnp.einsum("pij,pjk,plk->pil", J, Sig_c, J) + 0.3 * jnp.eye(2, dtype=f32)
    det2 = Sig2[:, 0, 0] * Sig2[:, 1, 1] - Sig2[:, 0, 1] * Sig2[:, 1, 0]
    inv2 = (
        jnp.stack(
            [
                jnp.stack([Sig2[:, 1, 1], -Sig2[:, 0, 1]], -1),
                jnp.stack([-Sig2[:, 1, 0], Sig2[:, 0, 0]], -1),
            ],
            axis=-2,
        )
        / jnp.maximum(det2, 1e-12)[:, None, None]
    )

    u0 = params.fx * x / z_safe + cx
    v0 = params.fy * y / z_safe + cy

    # vMF view-dependent shading: I(v) ∝ sum_b exp(eta_b . v) (NO SH).
    view = mu_c / jnp.maximum(jnp.linalg.norm(mu_c, axis=-1, keepdims=True), 1e-6)
    view_w = view @ R_wc.T  # back to world for the world-frame lobes
    dots = jnp.einsum("pbi,pi->pb", etas.astype(f32), -view_w)
    kap = jnp.linalg.norm(etas.astype(f32), axis=-1)
    shade = jnp.sum(jnp.exp(dots - kap), axis=-1) / jnp.maximum(
        jnp.sum(jnp.exp(jnp.zeros_like(kap)), axis=-1), 1.0
    )
    shade = 0.4 + 0.6 * jnp.clip(shade, 0.0, 1.0)

    # world-space fBm texture modulation
    noise = _fbm_value_noise(mu_world.astype(f32))
    albedo = jnp.clip(colors.astype(f32) * (1.0 + params.noise_amp * noise[:, None]), 0.0, 1.0)
    rgb_p = albedo * shade[:, None]

    alpha_p = params.alpha_scale * masses.astype(f32) / (masses.astype(f32) + 1.0)
    alpha_p = alpha_p * in_front.astype(f32)

    # front-to-back composite in depth order
    order = jnp.argsort(z)
    u0o, v0o = u0[order], v0[order]
    inv2o = inv2[order]
    rgbo = rgb_p[order]
    alphao = alpha_p[order]
    zo = z[order]

    us = jnp.arange(W, dtype=f32)[None, :]
    vs = jnp.arange(H, dtype=f32)[:, None]

    def composite(carry, splat):
        rgb_acc, trans_acc, depth_acc = carry
        u_s, v_s, i2, col, a, zz = splat
        du = us - u_s
        dv = vs - v_s
        q = -0.5 * (i2[0, 0] * du * du + (i2[0, 1] + i2[1, 0]) * du * dv + i2[1, 1] * dv * dv)
        w_pix = jnp.where(q > params.log_clip, jnp.exp(q), 0.0) * a  # (H, W)
        contrib = w_pix * trans_acc
        rgb_acc = rgb_acc + contrib[..., None] * col[None, None, :]
        depth_acc = depth_acc + contrib * zz
        trans_acc = trans_acc * (1.0 - w_pix)
        return (rgb_acc, trans_acc, depth_acc), None

    rgb0 = jnp.zeros((H, W, 3), dtype=f32)
    trans0 = jnp.ones((H, W), dtype=f32)
    depth0 = jnp.zeros((H, W), dtype=f32)
    (rgb, trans, depth), _ = jax.lax.scan(
        composite, (rgb0, trans0, depth0), (u0o, v0o, inv2o, rgbo, alphao, zo)
    )
    cover = jnp.maximum(1.0 - trans, 1e-6)
    return jnp.clip(rgb, 0.0, 1.0), depth / cover


def render_atlas(atlas, cam_pose, params: RenderParams = RenderParams(), max_splats: int = 4096,
                 use_pallas: bool | None = None):
    """Render the top-mass splats of a device-resident atlas. On TPU the
    Pallas tiled rasterizer (outputs/rendering_pallas.py) is used — O(image +
    splats) HBM traffic vs this module's scan compositor."""
    T, M = atlas.weights.shape
    w = jnp.where(atlas.valid, atlas.weights, -jnp.inf).reshape(-1)
    k = min(max_splats, T * M)
    _, idx = jax.lax.top_k(w, k)
    ti, si = idx // M, idx % M
    Lam = atlas.Lambdas[ti, si].astype(jnp.float32)
    Sigma = linalg.inv3x3(Lam, eps=1e-6)
    th = atlas.thetas[ti, si].astype(jnp.float32)
    mu = jnp.einsum("pij,pj->pi", Sigma, th)
    masses = jnp.where(jnp.isfinite(w[idx]), atlas.weights.reshape(-1)[idx], 0.0)
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if use_pallas:
        from gcslam_tpu.outputs.rendering_pallas import render_splats_pallas

        return render_splats_pallas(
            mu, Sigma, atlas.etas[ti, si], atlas.rgb[ti, si], masses, cam_pose, params
        )
    return render_splats(
        mu, Sigma, atlas.etas[ti, si], atlas.rgb[ti, si], masses, cam_pose, params
    )
