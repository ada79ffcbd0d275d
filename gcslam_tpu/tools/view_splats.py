"""Splat-map viewer CLI — the build_rerun_from_splat / view_splat_jaxsplat
analog: renders the exported splat map with the in-repo EWA+vMF renderer
(on the attached accelerator) and writes PNGs + a 3D overview.

  python -m gcslam_tpu.tools.view_splats results/run1/splat_export.npz \
      [--traj results/run1/trajectory.tum] [--out results/run1/views]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("splats")
    p.add_argument("--traj", default=None, help="TUM trajectory: render from the last pose")
    p.add_argument("--out", default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--max-splats", type=int, default=4096)
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import gcslam_tpu  # noqa: F401
    from gcslam_tpu.utils.xla import jnp
    from gcslam_tpu.outputs.rendering import render_splats, RenderParams
    from gcslam_tpu.ops import se3

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir = args.out or os.path.join(os.path.dirname(args.splats), "views")
    os.makedirs(out_dir, exist_ok=True)
    sp = np.load(args.splats)
    mu, Sigma = sp["mu_world"], sp["Sigma_world"]
    etas, colors, masses = sp["etas"], sp["colors"], sp["masses"]
    n = len(mu)
    if n > args.max_splats:
        top = np.argsort(-masses)[: args.max_splats]
        mu, Sigma, etas, colors, masses = mu[top], Sigma[top], etas[top], colors[top], masses[top]

    # camera pose: last trajectory pose, or an overview vantage
    if args.traj:
        from gcslam_tpu.outputs.tum import read_tum

        _, poses = read_tum(args.traj)
        cam = poses[-1]
    else:
        c = mu.mean(0)
        cam = np.concatenate([c + [0.0, -8.0, 3.0], [0.4, 0.0, np.pi / 2]])

    rgb, depth = render_splats(
        jnp.asarray(mu), jnp.asarray(Sigma), jnp.asarray(etas),
        jnp.asarray(colors), jnp.asarray(masses), jnp.asarray(cam),
        RenderParams(width=480, height=360, fx=360.0, fy=360.0),
    )
    plt.imsave(os.path.join(out_dir, "render_rgb.png"), np.asarray(rgb))
    d = np.asarray(depth)
    plt.imsave(os.path.join(out_dir, "render_depth.png"), d / max(d.max(), 1e-6), cmap="viridis")

    # 3D overview scatter (ellipsoid axes as point sizes)
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    s = 2 + 40 * masses / (masses.max() + 1e-9)
    ax.scatter(mu[:, 0], mu[:, 1], mu[:, 2], c=np.clip(colors, 0, 1), s=s, depthshade=True)
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    ax.set_title(f"splat map ({n} primitives)")
    fig.savefig(os.path.join(out_dir, "map_3d.png"), dpi=110)
    print(f"wrote {out_dir}/render_rgb.png, render_depth.png, map_3d.png")


if __name__ == "__main__":
    main()
