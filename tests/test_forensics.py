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


def test_inspect_odom_source(bag, capsys):
    from gcslam_tpu.tools.inspect_odom_source import inspect_odom_source, main

    info = inspect_odom_source(bag)
    assert info["topic"] == "/odom"
    assert info["frame_id"] == "odom" and info["child_frame_id"] == "base"
    assert 15.0 < info["rate_hz"] < 25.0
    assert info["quat_unit_norm"]
    # _make_bag's odometry carries zero twists => pose-only verdict
    assert info["twist_dead"] and info["verdict"].startswith("POSE_ONLY")
    assert main([bag]) == 0
    assert "POSE_ONLY" in capsys.readouterr().out


def _make_turn_bag(path: str, gyro_sign: float) -> None:
    """IMU+odom-only bag with one 2 s CCW turn (wz=+0.5).  gyro_sign=-1
    emits a flipped gyro Z — the failure check_turn_invariant must catch."""
    import sqlite3

    from gcslam_tpu.frontend import cdr

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
        [(1, "/imu/data", "sensor_msgs/msg/Imu", "cdr", ""),
         (2, "/odom", "nav_msgs/msg/Odometry", "cdr", "")],
    )
    rng = np.random.default_rng(1)
    rows = []
    wz, speed = 0.5, 0.3  # CCW turn: centripetal accel +y in base = wz*speed
    for i in range(800):  # 200 Hz, 4 s: 1 s still, 2 s turning, 1 s still
        t = 50.0 + i / 200.0
        turning = 1.0 <= (t - 50.0) < 3.0
        msg = cdr.Imu(
            header=cdr.Header(t, "imu"),
            orientation=np.array([0, 0, 0, 1.0]),
            angular_velocity=np.array([0, 0, gyro_sign * wz if turning else 0])
            + rng.normal(0, 1e-3, 3),
            linear_acceleration=np.array(
                [0, wz * speed if turning else 0, 9.81]) + rng.normal(0, 0.02, 3),
        )
        rows.append((1, int(t * 1e9), cdr.serialize_imu(msg)))
    for i in range(80):  # 20 Hz odometry with matching yaw rate
        t = 50.0 + i / 20.0
        turning = 1.0 <= (t - 50.0) < 3.0
        msg = cdr.Odometry(
            header=cdr.Header(t, "odom"), child_frame_id="base",
            position=np.zeros(3), orientation=np.array([0, 0, 0, 1.0]),
            pose_cov=np.eye(6).reshape(-1) * 1e-4,
            twist_linear=np.array([speed if turning else 0, 0, 0]),
            twist_angular=np.array([0, 0, wz if turning else 0]),
            twist_cov=np.eye(6).reshape(-1) * 1e-4,
        )
        rows.append((2, int(t * 1e9), cdr.serialize_odometry(msg)))
    conn.executemany(
        "INSERT INTO messages(topic_id, timestamp, data) VALUES (?,?,?)", rows)
    conn.commit()
    conn.close()


def test_check_turn_invariant(bag, tmp_path):
    from gcslam_tpu.tools.check_turn_invariant import check_turn_invariant, main

    # stationary rig bag: no turn windows, tool passes vacuously
    info = check_turn_invariant(bag)
    assert info["verdict"] == "NO_TURNS"

    good = str(tmp_path / "turn.db3")
    _make_turn_bag(good, gyro_sign=+1.0)
    info = check_turn_invariant(good)
    assert info["verdict"] == "OK" and info["n_turn_windows"] >= 1
    w = info["windows"][0]
    assert w["signs_agree"] and w["accel_base_y_mean"] > 0.05
    assert main([good]) == 0

    flipped = str(tmp_path / "flip.db3")
    _make_turn_bag(flipped, gyro_sign=-1.0)
    info = check_turn_invariant(flipped)
    assert info["verdict"] == "GYRO_Z_FLIPPED"
    assert main([flipped, "--json"]) == 1


def test_diagnose_gyro_composition():
    from gcslam_tpu.tools.diagnose_gyro_composition import (
        diagnose_gyro_composition, main)

    info = diagnose_gyro_composition()
    assert info["verdict"] == "OK"
    for pr in info["gyro_probes"]:
        assert pr["same_direction"] and pr["increment_error_deg"] < 0.5
    assert info["odom_relative_probe"]["same_direction"]
    assert main(["--json"]) == 0


def _make_plane_bag(path: str, tilt_deg: float) -> None:
    """LiDAR-only bag: dense ground plane at z=-0.5 + two pillars, optionally
    rotated tilt_deg about x (an angled mount)."""
    import sqlite3

    from gcslam_tpu.frontend import cdr

    conn = sqlite3.connect(path)
    conn.executescript(
        """
        CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT,
                            serialization_format TEXT, offered_qos_profiles TEXT);
        CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER,
                              timestamp INTEGER, data BLOB);
        """
    )
    conn.execute("INSERT INTO topics VALUES (1, '/points', "
                 "'sensor_msgs/msg/PointCloud2', 'cdr', '')")
    rng = np.random.default_rng(3)
    th = np.radians(tilt_deg)
    R = np.array([[1, 0, 0],
                  [0, np.cos(th), -np.sin(th)],
                  [0, np.sin(th), np.cos(th)]])
    fields = [cdr.PointField("x", 0, 7, 1), cdr.PointField("y", 4, 7, 1),
              cdr.PointField("z", 8, 7, 1)]
    rows = []
    for k in range(8):
        ground = np.column_stack([rng.uniform(-6, 6, 600),
                                  rng.uniform(-6, 6, 600),
                                  rng.normal(-0.5, 0.01, 600)])
        pil = np.column_stack([rng.normal(3, 0.05, 100),
                               rng.normal(1, 0.05, 100),
                               rng.uniform(-0.5, 1.5, 100)])
        pts = (np.vstack([ground, pil]) @ R.T).astype("<f4")
        msg = cdr.PointCloud2(
            header=cdr.Header(10.0 + 0.1 * k, "lidar"), height=1,
            width=len(pts), fields=fields, is_bigendian=False, point_step=12,
            row_step=12 * len(pts), data=pts.tobytes(), is_dense=True)
        rows.append((1, int((10.0 + 0.1 * k) * 1e9),
                     cdr.serialize_pointcloud2(msg)))
    conn.executemany(
        "INSERT INTO messages(topic_id, timestamp, data) VALUES (?,?,?)", rows)
    conn.commit()
    conn.close()


def test_check_lidar_mount_angle(tmp_path):
    from gcslam_tpu.tools.check_lidar_mount_angle import (
        check_lidar_mount_angle, main)

    flat = str(tmp_path / "flat.db3")
    _make_plane_bag(flat, tilt_deg=0.0)
    info = check_lidar_mount_angle(flat, skip=0, n_scans=5)
    assert info["verdict"] == "HORIZONTAL", info
    assert info["ground_tilt_deg"] < 5.0
    assert main([flat, "--skip", "0"]) == 0

    tilted = str(tmp_path / "tilt.db3")
    _make_plane_bag(tilted, tilt_deg=40.0)
    info = check_lidar_mount_angle(tilted, skip=0, n_scans=5)
    assert info["verdict"] == "ANGLED", info
    assert 30.0 < info["ground_tilt_deg"] < 50.0


def test_compare_imu_sources(bag):
    from gcslam_tpu.tools.compare_imu_sources import compare_imu_sources, main

    info = compare_imu_sources(bag)
    assert info["recommended"] == "/imu/data"
    src = info["sources"]["/imu/data"]
    # stationary +9.81z IMU: aligned with up, m/s^2 units, no dropouts
    assert src["misalignment_deg"] < 3.0
    assert src["accel_units_guess"] == "m/s^2"
    assert src["dropouts"] == 0
    assert 150 < src["rate_hz"] < 250
    assert main([bag]) == 0


def test_dump_and_plot_wz(bag, tmp_path):
    from gcslam_tpu.tools.dump_raw_imu_odom import dump_raw_imu_odom
    from gcslam_tpu.tools.plot_wz_odom import load_wz, main as plot_main

    info = dump_raw_imu_odom(bag, str(tmp_path), max_imu=50, max_odom=10)
    assert "imu_csv" in info and "odom_csv" in info
    with open(info["imu_csv"]) as f:
        lines = f.read().strip().splitlines()
    assert lines[0].startswith("stamp_sec,") and len(lines) == 51

    t, wz = load_wz(info["odom_csv"])
    assert len(t) == 10 and np.all(np.isfinite(wz))
    out = str(tmp_path / "wz.png")
    assert plot_main([info["odom_csv"], "--out", out]) == 0
    assert (tmp_path / "wz.png").stat().st_size > 1000
    # bag input path too
    t2, wz2 = load_wz(bag)
    np.testing.assert_allclose(wz2[:10], wz, atol=1e-12)


def test_first_n_messages_summary(bag, tmp_path):
    from gcslam_tpu.tools.first_n_messages_summary import (
        first_n_messages_summary, main)

    info = first_n_messages_summary(bag, n=2)
    assert set(info["topics"]) == {"/lidar/points", "/imu/data", "/odom"}
    pc = info["topics"]["/lidar/points"]["messages"][0]
    assert {f["name"] for f in pc["fields"]} >= {"x", "y", "z", "ring"}
    assert pc["first_point_xyz"] is not None
    od = info["topics"]["/odom"]["messages"][0]
    assert od["child_frame_id"] == "base" and len(od["pose_cov_diag"]) == 6
    out = str(tmp_path / "s.json")
    assert main([bag, "--json", out]) == 0
    assert json.load(open(out))["topics"]


def test_kimera_calibration_to_gc(tmp_path):
    from gcslam_tpu.tools.kimera_calibration_to_gc import (
        convert, apply_to_config, main)

    # 90-deg yaw + translation for the lidar; identity gyro at an offset
    ext = tmp_path / "extrinsics.yaml"
    ext.write_text(
        "transforms:\n"
        "  - name: T_baselink_lidar\n"
        "    T: [[0, -1, 0, 0.1], [1, 0, 0, -0.2], [0, 0, 1, 0.3], [0, 0, 0, 1]]\n"
        "  - name: T_cameralink_gyro\n"
        "    T: [[1, 0, 0, 0.01], [0, 1, 0, 0.02], [0, 0, 1, 0.03], [0, 0, 0, 1]]\n"
    )
    out = convert(str(ext))
    np.testing.assert_allclose(out["T_base_lidar"][:3], [0.1, -0.2, 0.3])
    np.testing.assert_allclose(out["T_base_lidar"][3:], [0, 0, np.pi / 2],
                               atol=1e-5)
    np.testing.assert_allclose(out["T_base_imu"], [0.01, 0.02, 0.03, 0, 0, 0],
                               atol=1e-9)
    # override the IMU rotation with a bag estimate
    out2 = convert(str(ext), imu_rotation=[-1.6, 0.0, 0.1])
    assert out2["T_base_imu"][3:] == [-1.6, 0.0, 0.1]

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("frontend:\n"
                   "  T_base_lidar: [0, 0, 0, 0, 0, 0]\n"
                   "  T_base_imu: [0, 0, 0, 0, 0, 0]\n")
    replaced = apply_to_config(str(cfg), out)
    assert set(replaced) == {"T_base_lidar", "T_base_imu"}
    assert "0.100000" in cfg.read_text()
    assert main([str(ext), "--apply", "--config", str(cfg)]) == 0


def test_evaluate_trajectory_2d(tmp_path):
    from gcslam_tpu.outputs.tum import write_tum
    from gcslam_tpu.tools.evaluate_trajectory_2d import (
        evaluate_trajectory_2d, main)

    t = np.linspace(0, 10, 60)
    gt = np.zeros((60, 6))
    gt[:, 0] = np.cos(t * 0.5) * 3
    gt[:, 1] = np.sin(t * 0.5) * 3
    gt[:, 2] = 0.85  # constant GT height: must not pollute the 2D score
    gt[:, 5] = t * 0.5 + np.pi / 2
    est = gt.copy()
    # rigid SE(2) offset + small noise + garbage z: 2D alignment removes all
    # but the noise
    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    est[:, :2] = gt[:, :2] @ R.T + [5.0, -2.0]
    est[:, 5] += th
    est[:, 2] = np.linspace(0, 4, 60)  # meaningless wheel-odometry z
    rng = np.random.default_rng(0)
    est[:, :2] += rng.normal(0, 0.01, (60, 2))
    g_path, e_path = str(tmp_path / "gt.tum"), str(tmp_path / "est.tum")
    write_tum(g_path, t, gt)
    write_tum(e_path, t, est)

    info = evaluate_trajectory_2d(e_path, g_path)
    assert info["n_pairs"] == 60
    assert abs(abs(info["align"]["theta_deg"]) - np.degrees(th)) < 2.0
    assert info["ate_2d"]["rmse"] < 0.05  # z garbage + SE2 offset removed
    assert info["yaw_deg"]["rmse"] < 2.0
    out = str(tmp_path / "p.png")
    assert main([e_path, g_path, "--plot", out, "--json"]) == 0


def test_camera_info_roundtrip():
    from gcslam_tpu.frontend import cdr

    msg = cdr.CameraInfo(
        header=cdr.Header(42.5, "cam_optical"), height=480, width=640,
        distortion_model="plumb_bob", d=np.array([0.1, -0.05, 0.0, 0.0, 0.01]),
        k=np.array([381.1, 0, 315.8, 0, 380.8, 238.0, 0, 0, 1.0]),
        r=np.eye(3).reshape(-1), p=np.zeros(12),
    )
    out = cdr.parse_camera_info(cdr.serialize_camera_info(msg))
    assert out.header.frame_id == "cam_optical"
    assert (out.height, out.width) == (480, 640)
    assert out.distortion_model == "plumb_bob"
    np.testing.assert_allclose(out.d, msg.d)
    np.testing.assert_allclose(out.k, msg.k)


def test_inspect_camera_frames(bag, tmp_path):
    import shutil

    from tests.test_camera_bag import _add_camera_topics
    from gcslam_tpu.frontend import cdr
    from gcslam_tpu.tools.inspect_camera_frames import (
        inspect_camera_frames, main)

    cam_bag = str(tmp_path / "cam.db3")
    shutil.copy(bag, cam_bag)
    _add_camera_topics(cam_bag)
    # add a CameraInfo topic too
    import sqlite3

    conn = sqlite3.connect(cam_bag)
    conn.execute("INSERT INTO topics VALUES (6, '/camera/color/camera_info', "
                 "'sensor_msgs/msg/CameraInfo', 'cdr', '')")
    ci = cdr.CameraInfo(
        header=cdr.Header(100.05, "cam"), height=96, width=128,
        distortion_model="plumb_bob", d=np.zeros(5),
        k=np.array([100.0, 0, 64, 0, 100.0, 48, 0, 0, 1]),
        r=np.eye(3).reshape(-1), p=np.zeros(12))
    conn.execute("INSERT INTO messages(topic_id, timestamp, data) "
                 "VALUES (6, ?, ?)", (int(100.05e9), cdr.serialize_camera_info(ci)))
    conn.commit()
    conn.close()

    info = inspect_camera_frames(cam_bag)
    assert "/camera/color/compressed" in info["topics"]
    intr = info["topics"]["/camera/color/camera_info"]["intrinsics"]
    assert intr["fx"] == 100.0 and intr["size"] == [128, 96]
    pr = info["rgb_depth_pairing"]
    assert pr["depth"] == "/camera/depth/image_raw"
    assert pr["median_dt_ms"] == pytest.approx(12.0, abs=1.0)
    assert pr["unpaired_frac"] == 0.0
    assert main([cam_bag]) == 0  # depth offset 12ms < 20ms window, no warnings


def test_diagnose_trajectory_alignment(tmp_path):
    from gcslam_tpu.outputs.tum import write_tum
    from gcslam_tpu.tools.diagnose_trajectory_alignment import (
        diagnose_trajectory_alignment, main)

    t = np.linspace(0, 20, 120)
    gt = np.zeros((120, 6))
    gt[:, 0] = np.cos(t * 0.4) * 4
    gt[:, 1] = np.sin(t * 0.4) * 4
    gt[:, 2] = 0.1 * np.sin(t)
    g_path = str(tmp_path / "gt.tum")
    write_tum(g_path, t, gt)

    # 1. identical trajectories: conventions OK
    e_path = str(tmp_path / "ok.tum")
    write_tum(e_path, t, gt + np.random.default_rng(0).normal(0, 0.003, gt.shape))
    info = diagnose_trajectory_alignment(e_path, g_path)
    assert info["verdict"] == "CONVENTIONS_OK"

    # 2. swapped X/Y with a sign flip (proper rotation): detect the remap
    est = gt.copy()
    est[:, 0], est[:, 1] = gt[:, 1].copy(), -gt[:, 0].copy()
    e_path = str(tmp_path / "swap.tum")
    write_tum(e_path, t, est)
    info = diagnose_trajectory_alignment(e_path, g_path)
    assert info["verdict"] == "AXIS_REMAP_NEEDED"
    best = np.asarray(info["best_mappings"][0]["matrix"])
    # est = [gt_y, -gt_x, gt_z] => the undo map is gt = [-e_y, e_x, e_z]
    np.testing.assert_array_equal(best, [[0, -1, 0], [1, 0, 0], [0, 0, 1]])
    assert info["best_mappings"][0]["ate_m"] < 0.01

    # 3. a pure Y sign flip (reflection): handedness bug flagged
    est = gt.copy()
    est[:, 1] = -gt[:, 1]
    e_path = str(tmp_path / "flip.tum")
    write_tum(e_path, t, est)
    info = diagnose_trajectory_alignment(e_path, g_path)
    assert info["verdict"].startswith("HANDEDNESS_FLIP")
    assert main([e_path, g_path, "--json"]) == 1


def _make_moving_bag(path: str, n: int = 80):
    """Odometry driving +x while yawing, gyro-z consistent; for the
    convention/axes validators."""
    import sqlite3

    from gcslam_tpu.frontend import cdr

    conn = sqlite3.connect(path)
    conn.executescript(
        """CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT,
           serialization_format TEXT, offered_qos_profiles TEXT);
           CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER,
           timestamp INTEGER, data BLOB);"""
    )
    conn.execute("INSERT INTO topics VALUES (1,'/odom','nav_msgs/msg/Odometry','cdr','')")
    conn.execute("INSERT INTO topics VALUES (2,'/imu','sensor_msgs/msg/Imu','cdr','')")
    wz = 0.3
    for i in range(n):
        t = 50.0 + 0.1 * i
        yaw = wz * (t - 50.0)
        q = np.array([0, 0, np.sin(yaw / 2), np.cos(yaw / 2)])
        msg = cdr.Odometry(
            header=cdr.Header(t, "odom"), child_frame_id="base",
            position=np.array([0.2 * i, 0.5 * np.sin(0.3 * i), 0.0]), orientation=q,
            pose_cov=np.eye(6).reshape(-1) * 1e-4, twist_linear=np.array([2.0, 0, 0]),
            twist_angular=np.array([0, 0, wz]), twist_cov=np.eye(6).reshape(-1) * 1e-4,
        )
        conn.execute("INSERT INTO messages(topic_id,timestamp,data) VALUES (1,?,?)",
                     (int(t * 1e9), cdr.serialize_odometry(msg)))
    for i in range(n * 5):
        t = 50.0 + 0.02 * i
        msg = cdr.Imu(
            header=cdr.Header(t, "imu"), orientation=np.array([0, 0, 0, 1.0]),
            angular_velocity=np.array([0, 0, wz]),
            linear_acceleration=np.array([0, 0, 9.81]),
        )
        conn.execute("INSERT INTO messages(topic_id,timestamp,data) VALUES (2,?,?)",
                     (int(t * 1e9), cdr.serialize_imu(msg)))
    conn.commit()
    conn.close()


def test_validate_conventions(tmp_path, capsys):
    from gcslam_tpu.tools.validate_conventions import validate_conventions, main

    path = str(tmp_path / "move.db3")
    _make_moving_bag(path)
    rep = validate_conventions(path)
    assert rep["odom"]["frame_stable"]
    assert rep["odom"]["quat_norm_max_dev"] < 1e-6
    assert rep["odom"]["yaw_span_deg"] > 30.0
    assert rep["imu"]["accel_units_verdict"] == "m/s^2"
    assert rep["gravity_alignment"]["aligned"]  # identity extrinsic, +z gravity
    assert rep["gyro_vs_odom_yawrate"]["sign_consistent"]
    # a yaw-flipping extrinsic must flip the sign correlation
    rep2 = validate_conventions(path, t_base_imu_rotvec=np.array([np.pi, 0, 0]))
    assert rep2["gyro_vs_odom_yawrate"]["sign_flipped"]
    assert not rep2["gravity_alignment"]["aligned"]
    assert main([path, "--json"]) == 0
    assert "frame_stable" in capsys.readouterr().out


def test_diagnose_trajectory_axes(tmp_path, capsys):
    from gcslam_tpu.outputs.tum import write_tum
    from gcslam_tpu.tools.diagnose_trajectory_axes import (
        diagnose_trajectory_axes, main,
    )

    path = str(tmp_path / "move.db3")
    _make_moving_bag(path)
    t = 50.0 + 0.1 * np.arange(80)
    poses = np.zeros((80, 6))
    poses[:, 0] = 0.2 * np.arange(80)
    poses[:, 1] = 0.5 * np.sin(0.3 * np.arange(80))
    tum_ok = str(tmp_path / "ok.tum")
    write_tum(tum_ok, t, poses)
    rep = diagnose_trajectory_axes(path, tum_ok)
    assert rep["odom"]["dominant_axis"] == "x"
    assert rep["odom"]["planar_xy"]
    assert rep["axis_correlation"]["identity_mapping"]
    assert rep["verdict"].startswith("OK")

    # motion moved into z in the export: flag the mismatch
    poses_bad = np.zeros((80, 6))
    poses_bad[:, 2] = 0.2 * np.arange(80)
    poses_bad[:, 1] = 0.5 * np.sin(0.3 * np.arange(80))
    tum_bad = str(tmp_path / "bad.tum")
    write_tum(tum_bad, t, poses_bad)
    rep = diagnose_trajectory_axes(path, tum_bad)
    assert rep["tum"]["dominant_axis"] == "z"
    assert not rep["axis_correlation"]["identity_mapping"]
    assert rep["verdict"].startswith("AXIS MISMATCH")
    assert rep["axis_correlation"]["best_assignment"]["x"] == "z"
    assert main([path, tum_ok]) == 0
    assert "verdict" in capsys.readouterr().out


def test_trajectory_swaps(tmp_path, capsys):
    from gcslam_tpu.outputs.tum import write_tum
    from gcslam_tpu.tools.trajectory_swaps import rank_swaps, main

    rng = np.random.default_rng(1)
    t = np.arange(60) * 0.1
    est = np.zeros((60, 6))
    est[:, 0] = np.cos(0.2 * t) * 3
    est[:, 1] = np.sin(0.2 * t) * 3
    est[:, 2] = 0.05 * t
    est[:, 5] = 0.2 * t
    e_path = str(tmp_path / "est.tum")
    write_tum(e_path, t, est)

    # GT in a swapped frame: gt = M_true est with x=+y, y=-x (proper)
    M = np.array([[0.0, 1, 0], [-1, 0, 0], [0, 0, 1]])
    gt = est.copy()
    gt[:, :3] = est[:, :3] @ M.T + rng.normal(0, 0.002, (60, 3))
    gt[:, 3:6] = est[:, 3:6] @ M.T
    g_path = str(tmp_path / "gt.tum")
    write_tum(g_path, t, gt)

    rep = rank_swaps(e_path, g_path)
    assert not rep["identity_is_best"]
    # the winning permutation must undo M: best maps gt back onto est
    assert rep["best"]["ate_trans_rmse_m"] < 0.05
    assert rep["best"]["perm"] == "x=-y,y=+x,z=+z"

    # identity GT: identity wins
    g2 = str(tmp_path / "gt2.tum")
    write_tum(g2, t, est + rng.normal(0, 0.002, est.shape))
    rep2 = rank_swaps(e_path, g2)
    assert rep2["identity_is_best"]
    assert main([e_path, g2, "--top", "3"]) == 0
    assert "identity_is_best" in capsys.readouterr().out


def test_apply_imu_extrinsic(tmp_path, capsys):
    from gcslam_tpu.tools.dump_raw_imu_odom import dump_raw_imu_odom
    from gcslam_tpu.tools.apply_imu_extrinsic import apply_imu_extrinsic, main

    path = str(tmp_path / "move.db3")
    _make_moving_bag(path, n=20)
    out = dump_raw_imu_odom(path, out_dir=str(tmp_path), max_imu=50, max_odom=10)
    csv_in = out["imu_csv"]
    # pi about x: z -> -z for both gyro and accel
    rep = apply_imu_extrinsic(csv_in, np.array([np.pi, 0, 0]),
                              str(tmp_path / "imu_base.csv"))
    assert rep["n_rows"] == 50
    assert rep["mean_accel_base"][2] < -9.5  # +9.81 z flipped
    import csv as _csv

    with open(tmp_path / "imu_base.csv") as f:
        rows = list(_csv.reader(f))
    wz_col = rows[0].index("wz")
    assert float(rows[1][wz_col]) < -0.29  # wz=0.3 flipped
    assert main([csv_in, "--rotvec", "3.14159265,0,0"]) == 0
    assert "mean_accel_base" in capsys.readouterr().out


def test_replay_map_events(tmp_path, capsys):
    """The insertion event log replays: integrity checks + timeline +
    snapshot reconstruction (spec 5.7.7 consumer side)."""
    import json

    from gcslam_tpu.tools.replay_map_events import replay_map_events, main

    path = str(tmp_path / "map_events.jsonl")
    with open(path, "w") as f:
        gid = 0
        for s in range(4):
            f.write(json.dumps({"scan": s, "t": 100.0 + 0.1 * s,
                                "valid_total": 10.0 * (s + 1)}) + "\n")
            for _ in range(3):
                f.write(json.dumps({
                    "scan": s, "event": "insert", "id": gid,
                    "tile_id": 7 + (gid % 2), "mu_world": [1.0, 2.0, 0.1 * s],
                    "weight": 0.5, "t": 100.0 + 0.1 * s}) + "\n")
                gid += 1
    rep = replay_map_events(path, at_scan=1)
    assert rep["n_scans"] == 4 and rep["n_inserts"] == 12
    assert all(rep["integrity"].values())
    assert rep["snapshot"]["n_primitives"] == 6
    assert rep["timeline"]["n_tiles_touched"] == 2
    snap = str(tmp_path / "s.npz")
    assert main([path, "--at-scan", "2", "--snapshot", snap, "--json"]) == 0
    assert "ids_strictly_increasing" in capsys.readouterr().out
    import numpy as np

    assert np.load(snap)["positions"].shape == (9, 3)

    # a corrupted log (duplicate id) fails integrity and exits nonzero
    with open(path, "a") as f:
        f.write(json.dumps({"scan": 4, "event": "insert", "id": 0,
                            "tile_id": 7, "mu_world": [0, 0, 0],
                            "weight": 1.0, "t": 101.0}) + "\n")
    assert main([path]) == 1
