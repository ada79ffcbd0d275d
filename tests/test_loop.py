"""Loop-closure production (frontend/loop.py) + streaming injection."""

import numpy as np

from gcslam_tpu.frontend.loop import LoopDetector, LoopConfig, Keyframe
from gcslam_tpu.frontend.synthetic import generate, SyntheticConfig
from gcslam_tpu.models.config import PipelineConfig
from gcslam_tpu.models import runner

RNG = np.random.default_rng(7)


def test_register_recovers_known_transform():
    """ICP registration recovers a known relative pose between two views of
    the same cloud."""
    pts = np.c_[RNG.uniform(-3, 3, (400, 2)), RNG.uniform(0, 2, 400)]
    kf_pose = np.array([1.0, 0.5, 0.0, 0.0, 0.0, 0.3])
    cur_pose_true = np.array([1.3, 0.3, 0.0, 0.0, 0.0, 0.45])

    from gcslam_tpu.frontend.loop import _yaw_rotvec_to_R

    R_k = _yaw_rotvec_to_R(kf_pose[3:6])
    R_c = _yaw_rotvec_to_R(cur_pose_true[3:6])
    world = pts @ R_k.T + kf_pose[:3]  # keyframe body -> world
    cur_body = (world - cur_pose_true[:3]) @ R_c  # world -> cur body

    det = LoopDetector(LoopConfig())
    kf = Keyframe(index=0, pose=kf_pose, points_body=pts)
    # init guess off by 10 cm / 3 deg
    guess = cur_pose_true + np.array([0.1, -0.05, 0, 0, 0, 0.05])
    fit = det._register(cur_body, guess, kf)
    assert fit is not None
    loop_pose, cov, w = fit
    assert np.linalg.norm(loop_pose[:3] - cur_pose_true[:3]) < 0.02
    assert abs(loop_pose[5] - cur_pose_true[5]) < 0.01
    assert w > 0.5
    assert cov[0, 0] < 0.1


def test_stream_with_loops_runs_and_fires():
    run = generate(SyntheticConfig(n_scans=60, n_points=1024,
                                   odom_drift_pos_per_m=0.08,
                                   odom_drift_yaw_per_m=0.04, seed=0))
    cfg = PipelineConfig(with_map=True, atlas_max_tiles=32, m_tile=256,
                         m_tile_view=128, n_surfel=128, surfel_voxel_size_m=0.3)
    det = LoopDetector(LoopConfig(keyframe_every=5, min_index_gap=15,
                                  max_revisit_dist_m=3.0, cooldown_scans=10))
    state, out = runner.run_stream(run.batches, cfg, loop_detector=det)
    poses = np.asarray(out.pose)
    assert np.isfinite(poses).all()
    fired = np.asarray(out.tape.io_loop_weight)
    assert (fired > 0).any(), "no loop factor fired on a loitering start"
    # trajectory stays sane
    gt = run.gt_poses[:60]
    xy = np.linalg.norm(poses[:, :2] - gt[:, :2], axis=1)
    assert xy.max() < 1.5
