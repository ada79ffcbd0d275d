"""MCAP container support: round-trip through the in-repo writer, zstd chunk
decode, and load_bag dispatch (.mcap promises in the CLI are now real)."""

import struct

import numpy as np
import pytest

from gcslam_tpu.frontend import cdr, mcap, rosbag


def _write_small_mcap(path, n_scans=3):
    w = mcap.McapWriter(path)
    w.add_channel("/lidar/points", "sensor_msgs/msg/PointCloud2")
    w.add_channel("/imu/data", "sensor_msgs/msg/Imu")
    w.add_channel("/odom", "nav_msgs/msg/Odometry")
    rng = np.random.default_rng(0)
    for i in range(200):
        t = 100.0 + i / 100.0
        msg = cdr.Imu(cdr.Header(t, "imu"), np.array([0, 0, 0, 1.0]),
                      rng.normal(0, 1e-3, 3), np.array([0, 0, 9.81]))
        w.write_message("/imu/data", t, cdr.serialize_imu(msg))
    for i in range(n_scans * 2):
        t = 100.0 + i * 0.05
        msg = cdr.Odometry(cdr.Header(t, "odom"), "base", np.zeros(3),
                           np.array([0, 0, 0, 1.0]), np.eye(6).reshape(-1) * 1e-4,
                           np.zeros(3), np.zeros(3), np.eye(6).reshape(-1) * 1e-4)
        w.write_message("/odom", t, cdr.serialize_odometry(msg))
    fields = [cdr.PointField("x", 0, 7, 1), cdr.PointField("y", 4, 7, 1),
              cdr.PointField("z", 8, 7, 1)]
    for k in range(n_scans):
        t = 100.1 + k * 0.1
        pts = rng.normal(size=(100, 3)).astype("<f4")
        pts = 5 * pts / np.linalg.norm(pts, axis=1, keepdims=True)
        msg = cdr.PointCloud2(cdr.Header(t, "lidar"), 1, 100, fields, False,
                              12, 1200, pts.tobytes(), True)
        w.write_message("/lidar/points", t, cdr.serialize_pointcloud2(msg))
    w.close()


def test_mcap_roundtrip_and_load_bag(tmp_path):
    path = str(tmp_path / "tiny.mcap")
    _write_small_mcap(path)
    raw = mcap.read_mcap_messages(path)
    types = raw.pop("__types__")
    assert types["/imu/data"] == "sensor_msgs/msg/Imu"
    assert len(raw["/lidar/points"]) == 3
    assert len(raw["/imu/data"]) == 200
    # stamps sorted and plausible
    ts = [t for t, _ in raw["/imu/data"]]
    assert ts == sorted(ts) and 99 < ts[0] < 101

    batches, _, _ = rosbag.load_bag(path, n_points=256)
    assert len(batches) == 3
    assert int(np.sum(np.asarray(batches[0].point_weights) > 0)) > 50


def test_mcap_zstd_chunk(tmp_path):
    """Messages inside a zstd-compressed chunk record decode identically."""
    import zstandard

    plain = str(tmp_path / "plain.mcap")
    _write_small_mcap(plain, n_scans=2)
    with open(plain, "rb") as f:
        buf = f.read()

    # rebuild: everything between magic and DATA_END goes into one zstd chunk
    records = []
    off = len(mcap.MAGIC)
    end_off = None
    for op, s, e in mcap._iter_records(buf, off, len(buf)):
        if op in (mcap.OP_DATA_END, mcap.OP_FOOTER):
            end_off = s - 9
            break
        records.append(buf[s - 9 : e])
    inner = b"".join(records)
    comp = zstandard.ZstdCompressor().compress(inner)
    chunk = (struct.pack("<QQQI", 0, 0, len(inner), 0)
             + struct.pack("<I", 4) + b"zstd"
             + struct.pack("<Q", len(comp)) + comp)
    out = str(tmp_path / "chunked.mcap")
    with open(out, "wb") as f:
        f.write(mcap.MAGIC)
        f.write(struct.pack("<BQ", mcap.OP_CHUNK, len(chunk)) + chunk)
        f.write(buf[end_off:])

    a = mcap.read_mcap_messages(plain)
    b = mcap.read_mcap_messages(out)
    a.pop("__types__")
    b.pop("__types__")
    assert set(a) == set(b)
    for k in a:
        assert a[k] == b[k], k


def test_mcap_rejects_non_mcap(tmp_path):
    p = tmp_path / "junk.mcap"
    p.write_bytes(b"not an mcap file at all")
    with pytest.raises(ValueError, match="not an MCAP"):
        mcap.read_mcap_messages(str(p))
