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

    panel("Fusion controls", [("alpha", tape.fusion_alpha), ("beta", tape.power_beta)])
    panel("Pose-block conditioning", [("cond_pose6 (log10)", np.log10(np.maximum(np.asarray(tape.cond_pose6), 1.0)))])
    panel(
        "Overconfidence sentinels",
        [
            ("dt_asymmetry", tape.overconfidence_dt_asymmetry),
            ("z_to_xy_ratio", tape.overconfidence_z_to_xy_ratio),
        ],
    )
    panel(
        "Support / mismatch",
        [("ess_total", tape.support_ess_total), ("nll_per_ess", tape.mismatch_nll_per_ess)],
    )
    panel(
        "Map activity",
        [
            ("valid_total", tape.map_valid_total),
            ("fused_mass", tape.map_fused_mass),
            ("n_culled", tape.map_n_culled),
        ],
    )
    panel("OT transport", [("transport_mass", tape.ot_transport_mass)])
    panel(
        "Trigger magnitude / anchor drift",
        [
            ("total_trigger_magnitude", tape.total_trigger_magnitude),
            ("anchor_drift_rho", tape.influence_anchor_drift_rho),
        ],
    )

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
