"""Run dashboard: trajectory + certificate sentinels + map stats as one
HTML page with embedded matplotlib panels (reference tools/slam_dashboard.py's
Plotly dashboard, re-homed to the deps available here)."""

from __future__ import annotations

import base64
import io
from typing import Optional

import numpy as np


def _fig_to_b64(fig) -> str:
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=110, bbox_inches="tight")
    import matplotlib.pyplot as plt

    plt.close(fig)
    return base64.b64encode(buf.getvalue()).decode()


def build_dashboard(
    path: str,
    tape,
    poses: np.ndarray,
    gt_poses: Optional[np.ndarray] = None,
    metrics: Optional[dict] = None,
) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = []

    # Trajectory (XY)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.plot(poses[:, 0], poses[:, 1], "-", label="estimate", lw=1.5)
    if gt_poses is not None:
        ax.plot(gt_poses[:, 0], gt_poses[:, 1], "--", label="ground truth", lw=1.2)
    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.legend()
    ax.set_title("Trajectory (XY)")
    panels.append(("Trajectory", _fig_to_b64(fig)))

    t = np.asarray(tape.timestamp)

    def panel(title, series):
        fig, ax = plt.subplots(figsize=(8, 2.4))
        for label, y in series:
            ax.plot(t, np.asarray(y), lw=1.0, label=label)
        ax.set_title(title)
        ax.legend(loc="upper right", fontsize=7)
        panels.append((title, _fig_to_b64(fig)))

    # Per-axis position (catches z-runaway / 180-degree flips at a glance)
    fig, axs = plt.subplots(2, 1, figsize=(8, 4), sharex=True)
    for i, lbl in enumerate("xyz"):
        axs[0].plot(t, poses[:, i], lw=1.0, label=lbl)
    axs[0].legend(fontsize=7)
    axs[0].set_title("Position per axis [m]")
    for i, lbl in enumerate(["rx", "ry", "rz"]):
        axs[1].plot(t, poses[:, 3 + i], lw=1.0, label=lbl)
    axs[1].legend(fontsize=7)
    axs[1].set_title("Rotation vector per axis [rad]")
    panels.append(("Per-axis pose", _fig_to_b64(fig)))

    panel("Fusion controls", [("alpha", tape.fusion_alpha), ("beta", tape.power_beta)])
    panel(
        "Pose-block conditioning",
        [
            ("cond_pose6 (log10)", np.log10(np.maximum(np.asarray(tape.cond_pose6), 1.0))),
            ("eigmin_pose6 (log10)", np.log10(np.maximum(np.asarray(tape.eigmin_pose6), 1e-30))),
        ],
    )
    panel(
        "Overconfidence sentinels",
        [
            ("dt_asymmetry", tape.overconfidence_dt_asymmetry),
            ("z_to_xy_ratio", tape.overconfidence_z_to_xy_ratio),
            ("ess_to_excitation", tape.overconfidence_ess_to_excitation),
        ],
    )
    panel(
        "Support / mismatch",
        [("ess_total", tape.support_ess_total), ("nll_per_ess", tape.mismatch_nll_per_ess),
         ("support_frac", tape.support_frac)],
    )
    panel(
        "Excitation coupling",
        [
            ("exc_dt_effect", tape.excitation_dt_effect),
            ("exc_ex_effect", tape.excitation_extrinsic_effect),
            ("1 - s_dt", tape.influence_dt_scale),
            ("1 - s_ex", tape.influence_extrinsic_scale),
        ],
    )
    panel(
        "ExpectedEffect: pose shift (predicted vs realized)",
        [
            ("predicted |d pose|", tape.ee_pose_shift_pred),
            ("realized |d pose|", tape.ee_pose_shift_real),
        ],
    )
    panel(
        "ExpectedEffect: info gain (predicted vs realized)",
        [
            ("predicted alpha*tr(L_ev)", tape.ee_info_gain_pred),
            ("realized d tr(L)", tape.ee_info_gain_real),
        ],
    )
    panel(
        "Map activity",
        [
            ("valid_total", tape.map_valid_total),
            ("fused_mass", tape.map_fused_mass),
            ("n_culled", tape.map_n_culled),
            ("n_merged", tape.map_n_merged),
        ],
    )
    panel(
        "Map masses",
        [
            ("insert_mass", tape.map_insert_mass),
            ("evicted_mass", tape.map_evicted_mass),
        ],
    )
    panel(
        "OT transport",
        [("transport_mass", tape.ot_transport_mass),
         ("marginal_defect_a", tape.ot_marginal_defect_a)],
    )
    panel(
        "Trigger magnitude / anchor drift / hypothesis spread",
        [
            ("total_trigger_magnitude", tape.total_trigger_magnitude),
            ("anchor_drift_rho", tape.influence_anchor_drift_rho),
            ("hyp_spread", tape.hyp_spread),
        ],
    )
    panel(
        "Stream health (scan IO)",
        [
            ("n_points_valid", tape.io_n_points_valid),
            ("n_imu_valid", tape.io_n_imu_valid),
            ("n_cam_valid", tape.io_n_cam_valid),
        ],
    )
    panel(
        "IMU coverage / loop factors",
        [("imu_coverage", tape.io_imu_coverage), ("loop_weight", tape.io_loop_weight)],
    )

    # Trigger timeline raster: which approximation fired on which scan
    # (reference slam_dashboard.py's trigger timeline).
    from gcslam_tpu.ops.certs import TRIGGER_NAMES, TRIGGERS

    masks = np.asarray(tape.cert_triggers).astype(np.int64)
    active_names = [n for n in TRIGGER_NAMES if np.any(masks & TRIGGERS[n])]
    if active_names:
        raster = np.stack([(masks & TRIGGERS[n]) > 0 for n in active_names])
        fig, ax = plt.subplots(figsize=(8, 0.28 * len(active_names) + 1.2))
        ax.imshow(raster, aspect="auto", interpolation="nearest", cmap="Blues")
        ax.set_yticks(range(len(active_names)))
        ax.set_yticklabels(active_names, fontsize=6)
        ax.set_xlabel("scan")
        ax.set_title("Approximation trigger timeline")
        panels.append(("Trigger timeline", _fig_to_b64(fig)))

    rows = []
    if metrics:
        import json

        rows.append(f"<pre>{json.dumps(metrics, indent=2)}</pre>")
    for title, b64 in panels:
        rows.append(f'<h3>{title}</h3><img src="data:image/png;base64,{b64}"/>')

    html = (
        "<html><head><title>gcslam_tpu run dashboard</title></head><body>"
        "<h1>gcslam_tpu run dashboard</h1>" + "\n".join(rows) + "</body></html>"
    )
    with open(path, "w") as f:
        f.write(html)
