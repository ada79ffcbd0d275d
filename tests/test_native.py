"""Native C++ decode library agrees bit-for-bit with the Python CDR codec."""

import numpy as np
import pytest

from gcslam_tpu.frontend import cdr, native
from gcslam_tpu import constants as C

RNG = np.random.default_rng(8)

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def _cloud(n=200):
    point_step = 22
    fields = [
        cdr.PointField("x", 0, 7, 1),
        cdr.PointField("y", 4, 7, 1),
        cdr.PointField("z", 8, 7, 1),
        cdr.PointField("intensity", 12, 7, 1),
        cdr.PointField("ring", 16, 4, 1),
        cdr.PointField("time", 18, 7, 1),
    ]
    raw = np.zeros((n, point_step), dtype=np.uint8)
    pts = RNG.normal(0, 5, (n, 3)).astype("<f4")
    pts[3] = np.nan  # a non-finite point
    raw[:, 0:12] = pts.view(np.uint8).reshape(n, 12)
    raw[:, 16:18] = RNG.integers(0, 16, (n, 1)).astype("<u2").view(np.uint8).reshape(n, 2)
    raw[:, 18:22] = np.linspace(0, 0.1, n).astype("<f4").view(np.uint8).reshape(n, 4)
    return cdr.PointCloud2(
        header=cdr.Header(42.25, "lidar"), height=1, width=n, fields=fields,
        is_bigendian=False, point_step=point_step, row_step=point_step * n,
        data=raw.tobytes(), is_dense=True,
    )


def test_native_pointcloud_matches_python():
    msg = _cloud()
    buf = cdr.serialize_pointcloud2(msg)
    out = native.parse_pointcloud2(buf, 512, C.NONFINITE_SENTINEL)
    assert out is not None
    xyz_n, t_n, ring_n, tag_n, stamp = out
    xyz_p, t_p, ring_p, tag_p = cdr.pointcloud2_to_arrays(cdr.parse_pointcloud2(buf))
    assert abs(stamp - 42.25) < 1e-6
    np.testing.assert_allclose(xyz_n, xyz_p.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(t_n, t_p, atol=1e-5)
    np.testing.assert_array_equal(ring_n, ring_p)


def test_native_imu_odometry_batch():
    imus = []
    for i in range(16):
        imus.append(cdr.serialize_imu(cdr.Imu(
            header=cdr.Header(10.0 + i * 0.005, "imu"),
            orientation=np.array([0, 0, 0, 1.0]),
            angular_velocity=RNG.normal(0, 1, 3),
            linear_acceleration=RNG.normal(0, 1, 3) + [0, 0, 9.81],
        )))
    stamps, gyro, accel = native.parse_imu_batch(imus)
    ref = [cdr.parse_imu(b) for b in imus]
    np.testing.assert_allclose(stamps, [m.header.stamp_sec for m in ref], atol=1e-9)
    np.testing.assert_allclose(gyro, np.stack([m.angular_velocity for m in ref]))
    np.testing.assert_allclose(accel, np.stack([m.linear_acceleration for m in ref]))

    odos = []
    for i in range(5):
        odos.append(cdr.serialize_odometry(cdr.Odometry(
            header=cdr.Header(20.0 + i * 0.05, "odom"), child_frame_id="base",
            position=RNG.normal(0, 1, 3), orientation=np.array([0, 0, 0, 1.0]),
            pose_cov=RNG.normal(0, 1, 36), twist_linear=RNG.normal(0, 1, 3),
            twist_angular=RNG.normal(0, 1, 3), twist_cov=RNG.normal(0, 1, 36),
        )))
    stamps, pos, quat, pcov, twist, tcov = native.parse_odometry_batch(odos)
    ref = [cdr.parse_odometry(b) for b in odos]
    np.testing.assert_allclose(pos, np.stack([m.position for m in ref]))
    np.testing.assert_allclose(pcov, np.stack([m.pose_cov for m in ref]))
    np.testing.assert_allclose(twist[:, 3:], np.stack([m.twist_angular for m in ref]))


def test_native_visual_features_plane():
    """Native corner+depth stage: exact plane depth recovery and agreement
    with the camera frontend's contract."""
    import numpy as np
    from gcslam_tpu.frontend import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    H, W = 120, 160
    yy, xx = np.mgrid[0:H, 0:W]
    gray = (((xx // 10 + yy // 10) % 2) * 200 + 20).astype(np.uint8)
    depth = (2.0 + 0.002 * xx + 0.001 * yy).astype(np.float32)
    n, uv, score, z, zvar, normal, color = native.visual_features(gray, depth, max_feat=128)
    assert n > 50
    z_gt = 2.0 + 0.002 * uv[:n, 0] + 0.001 * uv[:n, 1]
    assert np.abs(z[:n] - z_gt).max() < 1e-3
    # plane normal in (du,dv,1) basis matches the injected gradient
    g = np.array([-0.002, -0.001, 1.0])
    g /= np.linalg.norm(g)
    assert np.abs(normal[:n] - g).max() < 1e-3


def test_native_camera_features_pipeline():
    """extract_camera_features_native produces a valid CameraFeatures batch
    compatible with the Python path's contract."""
    import numpy as np
    from gcslam_tpu.frontend import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    from gcslam_tpu.frontend.camera import (
        extract_camera_features_native, PinholeIntrinsics,
    )

    H, W = 120, 160
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    gray = (((xx // 12 + yy // 12) % 2) * 0.7 + 0.1) + rng.normal(0, 0.01, (H, W))
    depth = (3.0 - 0.004 * xx).astype(np.float32)
    rgb = np.stack([gray, gray, gray], -1)
    intr = PinholeIntrinsics(fx=120.0, fy=120.0, cx=W / 2, cy=H / 2)
    feats = extract_camera_features_native(gray, depth, rgb, intr, n_feat=128)
    assert feats is not None
    ok = np.asarray(feats.valid)
    assert ok.sum() > 30
    lam = np.asarray(feats.Lambdas)[ok]
    assert np.isfinite(lam).all()
    # precision is PSD-ish and depth is near truth
    eig = np.linalg.eigvalsh(0.5 * (lam + lam.transpose(0, 2, 1)))
    assert (eig[:, 0] > -1e-6).all()
    uv = np.asarray(feats.uv)[ok]
    z = np.asarray(feats.depth)[ok]
    assert np.abs(z - (3.0 - 0.004 * uv[:, 0])).max() < 0.05


def test_stream_pointclouds_matches_bulk_parse(tmp_path):
    """The async C++ streamer yields exactly the scans the bulk path parses
    (same payloads, same order), and load_bag produces identical batches
    with streaming on and off."""
    from tests.test_rosbag import _make_bag
    from gcslam_tpu import constants as C
    from gcslam_tpu.frontend import cdr, rosbag

    if not native.stream_available():
        pytest.skip("native streamer unavailable")
    path = str(tmp_path / "s.db3")
    _make_bag(path, n_scans=5)

    raw = rosbag.read_bag_messages(path)
    types = raw.pop("__types__")
    topic = next(n for n, t in types.items() if "PointCloud2" in t)
    bulk = []
    for _, buf in raw[topic]:
        m = cdr.parse_pointcloud2(buf)
        xyz, pt, ring, tag = cdr.pointcloud2_to_arrays(m)
        bulk.append((xyz, m.header.stamp_sec))

    streamed = list(native.stream_pointclouds(
        path, topic, 1 << 16, C.NONFINITE_SENTINEL))
    assert len(streamed) == len(bulk) == 5
    for (xyz_s, _t, _r, _g, stamp, bag_t), (xyz_b, stamp_b) in zip(streamed, bulk):
        assert abs(stamp - stamp_b) < 1e-6
        assert bag_t > 0
        np.testing.assert_allclose(xyz_s, xyz_b.astype(np.float32), atol=1e-5)

    # end-to-end loader equivalence (stream on by default for .db3)
    batches, _, _ = rosbag.load_bag(path, n_points=256)
    import gcslam_tpu.frontend.native as nat

    orig = nat.stream_available
    nat.stream_available = lambda: False
    try:
        batches_off, _, _ = rosbag.load_bag(path, n_points=256)
    finally:
        nat.stream_available = orig
    assert len(batches) == len(batches_off)
    import jax

    for a, b in zip(batches, batches_off):
        for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_stream_early_close_joins_worker(tmp_path):
    """Closing the generator mid-stream must join the worker cleanly (the
    max_scans early-exit path)."""
    from tests.test_rosbag import _make_bag
    from gcslam_tpu import constants as C

    if not native.stream_available():
        pytest.skip("native streamer unavailable")
    path = str(tmp_path / "s.db3")
    _make_bag(path, n_scans=6)
    from gcslam_tpu.frontend import rosbag

    raw = rosbag.read_bag_messages(path)
    types = raw.pop("__types__")
    topic = next(n for n, t in types.items() if "PointCloud2" in t)
    gen = native.stream_pointclouds(path, topic, 1 << 16, C.NONFINITE_SENTINEL)
    first = next(gen)
    assert first[0].shape[1] == 3
    gen.close()  # must not hang or crash

    # load_bag with max_scans < bag length exercises the same path
    from gcslam_tpu.frontend.rosbag import BagConfig

    batches, _, _ = rosbag.load_bag(path, config=BagConfig(n_points=256, max_scans=2))
    assert len(batches) == 2
