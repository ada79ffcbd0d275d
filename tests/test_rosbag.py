"""rosbag2 frontend: synthesize a real sqlite .db3 bag with CDR payloads and
run the full pipeline off it (no ROS anywhere)."""

import sqlite3

import numpy as np
import pytest

from gcslam_tpu.frontend import cdr, rosbag


def _make_bag(path: str, n_scans: int = 5, imu_hz: int = 200):
    conn = sqlite3.connect(path)
    conn.executescript(
        """
        CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT,
                            serialization_format TEXT, offered_qos_profiles TEXT);
        CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER,
                              timestamp INTEGER, data BLOB);
        """
    )
    conn.executemany(
        "INSERT INTO topics VALUES (?,?,?,?,?)",
        [
            (1, "/lidar/points", "sensor_msgs/msg/PointCloud2", "cdr", ""),
            (2, "/imu/data", "sensor_msgs/msg/Imu", "cdr", ""),
            (3, "/odom", "nav_msgs/msg/Odometry", "cdr", ""),
        ],
    )
    rng = np.random.default_rng(0)
    rows = []

    # IMU at rest: gyro 0, accel +9.81 z
    for i in range(int(n_scans * 0.1 * imu_hz) + imu_hz):
        t = 100.0 + i / imu_hz
        msg = cdr.Imu(
            header=cdr.Header(t, "imu"),
            orientation=np.array([0, 0, 0, 1.0]),
            angular_velocity=rng.normal(0, 1e-3, 3),
            linear_acceleration=np.array([0, 0, 9.81]) + rng.normal(0, 0.05, 3),
        )
        rows.append((2, int(t * 1e9), cdr.serialize_imu(msg)))

    # odom: stationary at origin
    for i in range(n_scans * 2 + 2):
        t = 100.0 + i * 0.05
        msg = cdr.Odometry(
            header=cdr.Header(t, "odom"),
            child_frame_id="base",
            position=rng.normal(0, 0.005, 3),
            orientation=np.array([0, 0, 0, 1.0]),
            pose_cov=np.eye(6).reshape(-1) * 1e-4,
            twist_linear=np.zeros(3),
            twist_angular=np.zeros(3),
            twist_cov=np.eye(6).reshape(-1) * 1e-4,
        )
        rows.append((3, int(t * 1e9), cdr.serialize_odometry(msg)))

    # VLP-16-like clouds: random points on a sphere shell
    point_step = 22  # x,y,z f32 (12) + intensity f32 (4) + ring u16 (2) + time f32 (4)
    fields = [
        cdr.PointField("x", 0, 7, 1),
        cdr.PointField("y", 4, 7, 1),
        cdr.PointField("z", 8, 7, 1),
        cdr.PointField("intensity", 12, 7, 1),
        cdr.PointField("ring", 16, 4, 1),
        cdr.PointField("time", 18, 7, 1),
    ]
    n_pts = 300
    for k in range(n_scans):
        t = 100.1 + k * 0.1
        raw = np.zeros((n_pts, point_step), dtype=np.uint8)
        d = rng.normal(size=(n_pts, 3))
        d = 5.0 * d / np.linalg.norm(d, axis=1, keepdims=True)
        raw[:, 0:12] = d.astype("<f4").view(np.uint8).reshape(n_pts, 12)
        raw[:, 16:18] = rng.integers(0, 16, (n_pts, 1)).astype("<u2").view(np.uint8).reshape(n_pts, 2)
        rel_t = np.linspace(0, 0.1, n_pts).astype("<f4")
        raw[:, 18:22] = rel_t.view(np.uint8).reshape(n_pts, 4)
        msg = cdr.PointCloud2(
            header=cdr.Header(t, "lidar"),
            height=1, width=n_pts, fields=fields, is_bigendian=False,
            point_step=point_step, row_step=point_step * n_pts,
            data=raw.tobytes(), is_dense=True,
        )
        rows.append((1, int(t * 1e9), cdr.serialize_pointcloud2(msg)))

    conn.executemany(
        "INSERT INTO messages(topic_id, timestamp, data) VALUES (?,?,?)", rows
    )
    conn.commit()
    conn.close()


def test_cdr_roundtrip_imu():
    msg = cdr.Imu(
        header=cdr.Header(123.456, "imu"),
        orientation=np.array([0.1, 0.2, 0.3, 0.9]),
        angular_velocity=np.array([1.0, 2.0, 3.0]),
        linear_acceleration=np.array([-1.0, 0.5, 9.8]),
    )
    out = cdr.parse_imu(cdr.serialize_imu(msg))
    assert abs(out.header.stamp_sec - 123.456) < 1e-6
    np.testing.assert_allclose(out.angular_velocity, msg.angular_velocity)
    np.testing.assert_allclose(out.linear_acceleration, msg.linear_acceleration)


def test_cdr_roundtrip_odometry():
    msg = cdr.Odometry(
        header=cdr.Header(5.0, "odom"),
        child_frame_id="base_link",
        position=np.array([1.0, 2.0, 3.0]),
        orientation=np.array([0.0, 0.0, 0.7071, 0.7071]),
        pose_cov=np.arange(36.0),
        twist_linear=np.array([0.1, 0.0, 0.0]),
        twist_angular=np.array([0.0, 0.0, 0.2]),
        twist_cov=np.arange(36.0) * 2,
    )
    out = cdr.parse_odometry(cdr.serialize_odometry(msg))
    assert out.child_frame_id == "base_link"
    np.testing.assert_allclose(out.position, msg.position)
    np.testing.assert_allclose(out.pose_cov, msg.pose_cov)
    np.testing.assert_allclose(out.twist_angular, msg.twist_angular)


def test_load_bag_and_run(tmp_path):
    bag = str(tmp_path / "tiny.db3")
    _make_bag(bag, n_scans=4)
    batches, _, _ = rosbag.load_bag(bag, n_points=512)
    assert len(batches) == 4
    b = batches[0]
    assert b.points.shape == (512, 3)
    assert float(b.dt_sec) > 0
    assert int(np.sum(np.asarray(b.imu_stamps) > 0)) > 10
    # run the pipeline end to end off the bag
    from gcslam_tpu.models.config import PipelineConfig
    from gcslam_tpu.models import runner

    cfg = PipelineConfig(with_map=True, atlas_max_tiles=8, m_tile=64,
                         m_tile_view=32, n_surfel=64, n_points_cap=8192)
    state, out = runner.run_bag(batches, cfg)
    poses = np.asarray(out.pose)
    assert np.all(np.isfinite(poses))
    # stationary rig: pose stays near origin
    assert np.linalg.norm(poses[-1][:3]) < 0.5
