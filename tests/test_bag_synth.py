"""Round-trip the real-schema bag synthesizer through the production
frontend (frontend/bag_synth.py -> rosbag.load_bag), including non-identity
extrinsics, clock skew + alignment, and the RGB-D camera stream."""

import numpy as np
import pytest

from gcslam_tpu.frontend import rosbag
from gcslam_tpu.frontend.bag_synth import write_synth_bag
from gcslam_tpu.frontend.synthetic import SyntheticConfig
from gcslam_tpu.frontend.time_alignment import TopicAlignment

T0 = 1665772901.387538

ALIGN = {
    "/syn/lidar": TopicAlignment(offset_sec=0.0, drift=0.0, t0_sec=T0),
    "/syn/imu": TopicAlignment(offset_sec=-4e-4, drift=2e-5, t0_sec=T0),
    "/syn/odom": TopicAlignment(offset_sec=6e-4, drift=-1e-5, t0_sec=T0),
    "/syn/rgb": TopicAlignment(offset_sec=-0.01, drift=3e-4, t0_sec=T0),
    "/syn/depth": TopicAlignment(offset_sec=-0.03, drift=-7e-5, t0_sec=T0),
}

BAG_CFG = rosbag.BagConfig(
    lidar_topic="/syn/lidar",
    imu_topic="/syn/imu",
    odom_topic="/syn/odom",
    # Kimera-magnitude mounts: ~92 deg IMU rotation, offset LiDAR
    T_base_lidar=(-0.065, -0.100, 0.109, -0.0027, -0.0694, 0.0290),
    T_base_imu=(-0.016, -0.030, 0.007, -1.6027, 0.0026, 0.0),
    alignment=ALIGN,
    with_camera=True,
    rgb_topic="/syn/rgb",
    depth_topic="/syn/depth",
    T_base_camera=(0.15, 0.0, 0.0, -1.2092, 1.2092, -1.2092),
    camera_intrinsics=(60.0, 60.0, 40.0, 30.0),
    n_points=512,
)


@pytest.fixture(scope="module")
def synth_bag(tmp_path_factory):
    d = tmp_path_factory.mktemp("bag")
    bag = str(d / "synth.db3")
    gt = str(d / "gt.tum")
    cfg = SyntheticConfig(n_scans=6, n_points=1024, seed=3)
    summary = write_synth_bag(
        bag, cfg, BAG_CFG, gt_path=gt, cam_size=(80, 60), cam_rate_hz=10.0
    )
    return bag, gt, summary


def test_bag_contents(synth_bag):
    bag, gt, summary = synth_bag
    assert summary["n_scans"] == 6
    assert summary["n_cam_frames"] > 0
    topics = rosbag.bag_topic_summary(bag)
    assert topics["/syn/lidar"][1] == 6
    assert topics["/syn/imu"][1] >= 100  # 200 Hz x 0.6 s
    assert "CompressedImage" in topics["/syn/rgb"][0]
    # GT file parses as TUM
    from gcslam_tpu.outputs import tum

    stamps, poses = tum.read_tum(gt)
    assert len(stamps) == 6
    # GT rows are stamped at the SCAN-END their pose was sampled at
    # (round-5 fix: they were stamped one window early through round 4)
    assert stamps[0] == pytest.approx(T0 + 0.1, abs=1e-6)


def test_roundtrip_through_frontend(synth_bag):
    bag, gt, _ = synth_bag
    batches, _, _ = rosbag.load_bag(bag, config=BAG_CFG)
    assert len(batches) == 6
    b = batches[-1]
    # clock alignment undoes the emitted skew: scan stamps land on the
    # 10 Hz grid at the epoch origin. t_scan is the WINDOW END (round-5
    # loader convention): header (sweep start, 6th scan = +0.5) + 0.1.
    t_scan = float(b.t_scan)
    assert abs((t_scan - T0) - 0.6) < 2e-3
    # IMU windows populated, stamps aligned INTO the scan timeline
    n_imu = int(np.sum(np.asarray(b.imu_stamps) > 0))
    assert n_imu >= 15
    imu_stamps = np.asarray(b.imu_stamps)[:n_imu]
    assert np.all(imu_stamps <= t_scan + 0.011)
    # IMU gravity direction: after the frontend's R_base_imu correction the
    # mean accel in base frame points +z (the ~92 deg mount is undone)
    acc = np.asarray(b.imu_accel)[:n_imu]
    acc_mean = acc.mean(axis=0)
    assert acc_mean[2] > 8.0, acc_mean
    # points in base frame: floor ring sits near z = -_SENSOR_Z + mount z
    pts = np.asarray(b.points)
    w = np.asarray(b.point_weights)
    assert pts[w > 0].shape[0] > 100
    # camera slice landed
    assert int(np.sum(np.asarray(b.cam_valid))) > 0


def test_bag_run_tracks_gt(synth_bag):
    """Full pipeline (tiny budgets) off the synthesized bag tracks the
    TUM ground truth after initial alignment."""
    bag, gt, _ = synth_bag
    import dataclasses

    batches, _, _ = rosbag.load_bag(bag, config=dataclasses.replace(
        BAG_CFG, with_camera=False))
    from gcslam_tpu.models.config import PipelineConfig
    from gcslam_tpu.models import runner
    from gcslam_tpu.outputs import tum
    from gcslam_tpu.eval import ate_rpe, gt_tools

    cfg = PipelineConfig(with_map=True, atlas_max_tiles=8, m_tile=64,
                         m_tile_view=32, n_surfel=64,
                         surfel_voxel_size_m=0.5)
    state, out = runner.run_bag(batches, cfg)
    poses = np.asarray(out.pose)
    assert np.all(np.isfinite(poses))
    gt_stamps, gt_poses = tum.read_tum(gt)
    scan_stamps = np.asarray([float(b.t_scan) for b in batches])
    gt_interp, _ = gt_tools.interpolate_gt(gt_stamps, gt_poses, scan_stamps)
    ate = ate_rpe.compute_ate(poses, gt_interp, align="initial")
    # 0.6 s of slow motion: anything sane lands well under 0.3 m
    assert ate["translation"]["rmse"] < 0.3, ate["translation"]
