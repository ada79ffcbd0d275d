"""Forensic tool suite against a synthesized CDR bag (the reference's
inspect_*/diagnose_*/check_* scripts, SURVEY.md 2.9 — each must run on a bag
and emit its reference-equivalent report)."""

import json

import numpy as np
import pytest

from tests.test_rosbag import _make_bag


@pytest.fixture(scope="module")
def bag(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("forensics") / "rig.db3")
    _make_bag(path, n_scans=5)
    return path


def test_inspect_odom_covariance(bag, capsys):
    from gcslam_tpu.tools.inspect_odom_covariance import inspect_odom_covariance, main

    info = inspect_odom_covariance(bag)
    assert info["result"] == "FIXED"
    assert info["n_sampled"] > 5
    np.testing.assert_allclose(info["diag_first"], [1e-4] * 6)
    assert main([bag]) == 0
    assert "FIXED" in capsys.readouterr().out


def test_inspect_odom_covariance_varies(tmp_path):
    """A bag whose covariance changes mid-stream must be flagged VARIES with
    the first differing index."""
    import sqlite3

    from gcslam_tpu.frontend import cdr
    from gcslam_tpu.tools.inspect_odom_covariance import inspect_odom_covariance

    path = str(tmp_path / "vary.db3")
    conn = sqlite3.connect(path)
    conn.executescript(
        """CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT,
           serialization_format TEXT, offered_qos_profiles TEXT);
           CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER,
           timestamp INTEGER, data BLOB);"""
    )
    conn.execute("INSERT INTO topics VALUES (1,'/odom','nav_msgs/msg/Odometry','cdr','')")
    for i in range(6):
        cov = np.eye(6).reshape(-1) * (1e-4 if i < 3 else 5e-3)
        msg = cdr.Odometry(
            header=cdr.Header(10.0 + 0.1 * i, "odom"), child_frame_id="base",
            position=np.zeros(3), orientation=np.array([0, 0, 0, 1.0]),
            pose_cov=cov, twist_linear=np.zeros(3), twist_angular=np.zeros(3),
            twist_cov=cov,
        )
        conn.execute("INSERT INTO messages(topic_id,timestamp,data) VALUES (1,?,?)",
                     (int((10.0 + 0.1 * i) * 1e9), cdr.serialize_odometry(msg)))
    conn.commit()
    conn.close()
    info = inspect_odom_covariance(path)
    assert info["result"] == "VARIES"
    assert info["first_differing_index"] == 3


def test_diagnose_frames(bag):
    from gcslam_tpu.tools.diagnose_frames import diagnose_frames, main

    info = diagnose_frames(bag)
    assert info["lidar"]["n_points_sampled"] > 100
    # rest rig, accel +9.81 z => specific-force convention, ~0 tilt
    assert info["imu"]["units_guess"] == "m/s^2"
    assert "specific force" in info["imu"]["sign_convention"]
    assert info["imu"]["tilt_from_z_deg"] < 5.0
    assert info["odom"]["quat_normalized"]
    assert info["odom"]["planar"]
    # stationary => consistency check cannot find rotation, but must exist
    assert "consistency" in info
    assert main([bag, "--json"]) == 0


def test_check_extrinsics(bag, tmp_path, capsys):
    from gcslam_tpu.tools.check_extrinsics import check_extrinsics, main

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "with_map: false\n"
        "frontend:\n"
        "  T_base_lidar: [0,0,0, 0,0,0]\n"
        "  T_base_imu: [0,0,0, 0,0,0]\n"
    )
    info = check_extrinsics(str(cfg), bag)
    assert info["T_base_lidar"]["identity"]
    assert "warning" in info
    # accel is +9.81 z with identity extrinsic => ~0 deg tilt residual
    assert info["imu_check"]["tilt_from_vertical_deg"] < 5.0
    assert main([str(cfg), "--bag", bag]) == 0
    # a 90-deg-wrong T_base_imu must FAIL the tilt gate
    bad = tmp_path / "bad.yaml"
    bad.write_text(
        "with_map: false\n"
        "frontend:\n"
        "  T_base_imu: [0,0,0, 1.5707963, 0, 0]\n"
    )
    assert main([str(bad), "--bag", bag]) == 2


def test_compare_accel_odom(bag):
    from gcslam_tpu.tools.compare_accel_odom import compare_accel_odom, main

    info = compare_accel_odom(bag)
    # identity odom orientation + accel +9.81z => perfect agreement
    assert info["dot_mean"] > 0.99
    assert "agrees" in info["verdict"]
    assert main([bag]) == 0


def test_inspect_bag_deep(bag, tmp_path):
    from gcslam_tpu.tools.inspect_bag_deep import inspect_bag_deep, main

    info = inspect_bag_deep(bag)
    assert set(info["topics"]) == {"/lidar/points", "/imu/data", "/odom"}
    lid = info["topics"]["/lidar/points"]
    assert lid["points_per_msg"] == 300
    assert lid["stamps"]["monotonic"]
    assert 8.0 < lid["rate_hz"] < 12.0
    imu = info["topics"]["/imu/data"]
    assert 150.0 < imu["rate_hz"] < 250.0
    assert 8.0 < imu["accel_mag_mean"] < 11.5
    # all three required streams present => no missing-input warnings
    assert not any("NO " in w for w in info["warnings"])
    out_json = str(tmp_path / "summary.json")
    assert main([bag, "--json", out_json]) == 0
    assert json.load(open(out_json))["topics"]
