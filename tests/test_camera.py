"""Visual frontend unit tests (reference visual_feature_node math +
lidar_camera_depth_fusion routes) on procedural images."""

import numpy as np

from gcslam_tpu.utils.xla import jnp
from gcslam_tpu.frontend import camera

INTR = camera.PinholeIntrinsics(fx=200.0, fy=200.0, cx=80.0, cy=60.0)
RNG = np.random.default_rng(6)


def _checkerboard(H=120, W=160, sq=16):
    y, x = np.mgrid[0:H, 0:W]
    return (((y // sq) + (x // sq)) % 2).astype(np.float64)


def test_harris_finds_checkerboard_corners():
    img = _checkerboard()
    uv, score, valid = camera.harris_corners(jnp.asarray(img), n_feat=64)
    uv, valid = np.asarray(uv), np.asarray(valid)
    assert valid.sum() >= 20
    # corners lie on the 16-px lattice (within the 2-px smoothing support)
    got = uv[valid]
    off = np.minimum(got % 16, 16 - (got % 16))
    assert np.median(off) <= 2.0


def test_depth_plane_fit_and_backprojection():
    H, W = 120, 160
    # depth plane: z = 2 + 0.01 * u
    u = np.arange(W)[None, :].repeat(H, 0).astype(np.float64)
    depth = 2.0 + 0.01 * u
    uv = jnp.asarray([[80.0, 60.0], [40.0, 30.0]])
    z_fit, grad, resid = camera.depth_plane_fit(jnp.asarray(depth), uv)
    np.testing.assert_allclose(np.asarray(z_fit), [2.8, 2.4], atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad)[:, 0], [0.01, 0.01], atol=1e-9)
    assert np.all(np.asarray(resid) < 1e-12)

    p = camera.backproject(uv, z_fit, INTR)
    # center pixel backprojects onto the optical axis
    np.testing.assert_allclose(np.asarray(p)[0], [0.0, 0.0, 2.8], atol=1e-9)

    Sigma = camera.backprojection_covariance(uv, z_fit, jnp.asarray([1e-4, 1e-4]), INTR)
    S = np.asarray(Sigma)
    assert S.shape == (2, 3, 3)
    # z variance dominates the (2,2) entry
    np.testing.assert_allclose(S[:, 2, 2], 1e-4, atol=1e-12)
    eig = np.linalg.eigvalsh(S)
    assert eig.min() > 0


def test_lidar_depth_evidence_agrees_with_truth():
    # features at known pixels; LiDAR points on a z=3 wall in camera frame
    uv = jnp.asarray([[80.0, 60.0], [100.0, 60.0]])
    xs = RNG.uniform(-0.5, 0.5, 400)
    ys = RNG.uniform(-0.5, 0.5, 400)
    pts = np.stack([xs, ys, np.full(400, 3.0) + RNG.normal(0, 0.005, 400)], 1)
    lam, z = camera.lidar_depth_evidence(uv, jnp.asarray(pts), jnp.ones(400), INTR)
    lam, z = np.asarray(lam), np.asarray(z)
    assert np.all(lam > 1.0)
    np.testing.assert_allclose(z, 3.0, atol=0.05)


def test_extract_camera_features_end_to_end():
    H, W = 120, 160
    gray = _checkerboard(H, W)
    depth = np.full((H, W), 2.5)
    rgb = np.stack([gray, gray * 0.5, 1 - gray], -1)
    feats = camera.extract_camera_features(
        jnp.asarray(gray), jnp.asarray(depth), jnp.asarray(rgb), INTR, n_feat=64
    )
    valid = np.asarray(feats.valid)
    assert valid.sum() >= 20
    # all valid features at depth 2.5; info form consistent
    z = np.asarray(feats.depth)[valid]
    np.testing.assert_allclose(z, 2.5, atol=0.05)
    Lam = np.asarray(feats.Lambdas)[valid]
    th = np.asarray(feats.thetas)[valid]
    mu = np.einsum("nij,nj->ni", np.linalg.inv(Lam + 1e-9 * np.eye(3)), th)
    np.testing.assert_allclose(mu[:, 2], 2.5, atol=0.05)
    # base-frame transform keeps means consistent
    T = jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0, np.pi / 2])
    fb = camera.features_to_base_frame(feats, T)
    Lam_b = np.asarray(fb.Lambdas)[valid]
    th_b = np.asarray(fb.thetas)[valid]
    mu_b = np.einsum("nij,nj->ni", np.linalg.inv(Lam_b + 1e-9 * np.eye(3)), th_b)
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(mu_b, mu @ Rz.T + [1, 0, 0], atol=1e-6)
