"""Pallas tiled rasterizer == scan-compositor renderer (interpret mode on CPU)."""

import numpy as np

from gcslam_tpu.utils.xla import jnp
from gcslam_tpu.outputs.rendering import render_splats, RenderParams
from gcslam_tpu.outputs.rendering_pallas import render_splats_pallas

RNG = np.random.default_rng(11)


def _scene(P=48):
    mu = RNG.uniform(-3, 3, (P, 3))
    mu[:, 2] = RNG.uniform(2, 8, P)
    A = RNG.normal(0, 0.1, (P, 3, 3))
    Sigma = np.einsum("pij,pkj->pik", A, A) + 0.02 * np.eye(3)  # PSD
    etas = RNG.normal(0, 1, (P, 3, 3))
    colors = RNG.uniform(0, 1, (P, 3))
    masses = RNG.uniform(0.5, 5, P)
    return [jnp.asarray(x) for x in (mu, Sigma, etas, colors, masses)]


def test_pallas_matches_scan_compositor():
    scene = _scene()
    cam = jnp.zeros(6)
    params = RenderParams(width=256, height=128, fx=128.0, fy=128.0)
    rgb1, d1 = render_splats(*scene, cam, params)
    rgb2, d2 = render_splats_pallas(*scene, cam, params)
    r1, r2 = np.asarray(rgb1), np.asarray(rgb2)
    assert not np.isnan(r1).any() and not np.isnan(r2).any()
    assert np.abs(r1 - r2).max() < 5e-3
    # both actually drew something
    assert (r1.sum(-1) > 0.01).mean() > 0.2
    # depth agrees on well-covered pixels (low-alpha pixels divide by a tiny
    # coverage, amplifying fp accumulation-order differences)
    strong = (r1.sum(-1) > 0.3) & (np.asarray(d1) > 0.1)
    rel = np.abs(np.asarray(d2)[strong] - np.asarray(d1)[strong]) / np.asarray(d1)[strong]
    assert np.median(rel) < 1e-3
    assert np.quantile(rel, 0.99) < 0.05
