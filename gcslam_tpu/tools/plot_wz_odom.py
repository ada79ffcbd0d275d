"""Plot odometry yaw rate (wz): time series, integrated heading, polar view.

The reference's tools/plot_wz_odom.py:1-106 takes the odom CSV from
dump_raw_imu_odom and draws (1) heading-on-unit-circle points from
integrated wz and (2) a polar plot (angle=time, r=wz) — a quick visual for
yaw-rate sign conventions and turn structure. We accept either that CSV or
a bag directly, and add the plain wz(t) series (the most-read panel).

Usage:
  python -m gcslam_tpu.tools.plot_wz_odom odom_raw_first_300.csv --out wz.png
  python -m gcslam_tpu.tools.plot_wz_odom bag.db3 --out wz.png
"""

from __future__ import annotations

import argparse
import csv
import sys

import numpy as np


def load_wz(path: str, topic: str | None = None):
    """(stamps, wz) from an odom CSV (dump_raw_imu_odom layout) or a bag."""
    if path.endswith(".csv"):
        stamps, wz = [], []
        with open(path, newline="") as f:
            for row in csv.DictReader(f):
                stamps.append(float(row["stamp_sec"]))
                wz.append(float(row["wz"]))
        return np.asarray(stamps), np.asarray(wz)
    from gcslam_tpu.frontend import cdr, rosbag

    raw = rosbag.read_bag_messages(path)
    types = raw.pop("__types__")
    topic = topic or next(
        (n for n, t in types.items() if "Odometry" in t and raw.get(n)), None)
    if not topic or not raw.get(topic):
        raise SystemExit(f"no Odometry topic in {path}")
    msgs = [cdr.parse_odometry(b) for _, b in raw[topic]]
    return (np.asarray([m.header.stamp_sec for m in msgs]),
            np.asarray([m.twist_angular[2] for m in msgs]))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="odom CSV (dump_raw_imu_odom) or bag file")
    p.add_argument("--topic", default=None)
    p.add_argument("--out", default="wz_plots.png")
    args = p.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t, wz = load_wz(args.input, args.topic)
    if len(t) < 2:
        print("not enough odometry samples", file=sys.stderr)
        return 1
    tt = t - t[0]
    heading = np.concatenate([[0.0], np.cumsum(wz[:-1] * np.diff(t))])

    fig = plt.figure(figsize=(13, 4))
    ax1 = fig.add_subplot(1, 3, 1)
    ax1.plot(tt, wz, lw=0.8)
    ax1.set_xlabel("t [s]")
    ax1.set_ylabel("wz [rad/s]")
    ax1.set_title("odom yaw rate")
    ax1.axhline(0, color="k", lw=0.5)

    ax2 = fig.add_subplot(1, 3, 2)
    ax2.scatter(np.cos(heading), np.sin(heading), s=4, c=tt, cmap="viridis")
    ax2.set_aspect("equal")
    ax2.set_title("integrated heading (unit circle, color=time)")

    ax3 = fig.add_subplot(1, 3, 3, projection="polar")
    ax3.scatter(2 * np.pi * tt / max(tt[-1], 1e-9), np.abs(wz), s=3,
                c=np.sign(wz), cmap="coolwarm", vmin=-1, vmax=1)
    ax3.set_title("|wz| polar (angle=time, color=sign)")

    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"wrote {args.out}  (n={len(t)}, wz range "
          f"[{wz.min():.3f}, {wz.max():.3f}] rad/s, "
          f"net heading {np.degrees(heading[-1]):.1f} deg)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
