"""Post-run Rerun (.rrd) builder from splat_export.npz + trajectory.tum —
the offline equivalent of the reference's tools/build_rerun_from_splat.py
(SURVEY.md 2.9) and rerun_visualizer.py (2.4).

`rerun` is an optional dependency (not in the baked image): every entry
point degrades to a clear ImportError naming the missing module, and
`export_rrd(..., require=False)` returns False instead of raising so the
eval pipeline can call it unconditionally.

Logged entities (matching build_rerun_from_splat.py:40-520):
  world/map/points     colored points, radius from Sigma trace
  world/map/ellipsoids per-primitive covariance ellipsoids (top-K by mass)
  world/map/normals    vMF mean-direction arrows (top-K by kappa)
  world/trajectory     line strip of the TUM trajectory
"""

from __future__ import annotations

import numpy as np


def _load_rerun(require: bool):
    try:
        import rerun as rr  # type: ignore

        return rr
    except ImportError as e:
        if require:
            raise ImportError(
                "rerun-sdk is not installed in this image; install it to "
                "build .rrd visualizations (all other artifacts are "
                "independent of it)"
            ) from e
        return None


def export_rrd(
    splat_npz_path: str,
    out_rrd_path: str,
    trajectory_tum_path: str = None,
    top_k_ellipsoids: int = 512,
    require: bool = True,
) -> bool:
    rr = _load_rerun(require)
    if rr is None:
        return False

    d = np.load(splat_npz_path)
    mu = np.asarray(d["mu_world"], dtype=np.float32)
    Sigma = np.asarray(d["Sigma_world"], dtype=np.float32)
    colors = np.clip(np.asarray(d["colors"], dtype=np.float32), 0.0, 1.0)
    masses = np.asarray(d["masses"], dtype=np.float32)
    normals = np.asarray(d["normals"], dtype=np.float32)
    kappas = np.asarray(d["kappas"], dtype=np.float32)

    rr.init("gcslam_tpu", spawn=False)
    rr.save(out_rrd_path)

    radii = np.sqrt(np.maximum(np.trace(Sigma, axis1=1, axis2=2) / 3.0, 1e-8))
    rr.log(
        "world/map/points",
        rr.Points3D(mu, colors=(colors * 255).astype(np.uint8), radii=radii),
        static=True,
    )

    top = np.argsort(-masses)[:top_k_ellipsoids]
    evals, evecs = np.linalg.eigh(Sigma[top])
    half_sizes = np.sqrt(np.maximum(evals, 1e-10))
    quats = _rotmats_to_quats(evecs)
    rr.log(
        "world/map/ellipsoids",
        rr.Ellipsoids3D(
            centers=mu[top],
            half_sizes=half_sizes,
            quaternions=quats,
            colors=(colors[top] * 255).astype(np.uint8),
        ),
        static=True,
    )

    topn = np.argsort(-kappas)[:top_k_ellipsoids]
    rr.log(
        "world/map/normals",
        rr.Arrows3D(origins=mu[topn], vectors=0.2 * normals[topn]),
        static=True,
    )

    if trajectory_tum_path is not None:
        traj = np.loadtxt(trajectory_tum_path).reshape(-1, 8)
        rr.log(
            "world/trajectory",
            rr.LineStrips3D([traj[:, 1:4].astype(np.float32)]),
            static=True,
        )
    return True


def _rotmats_to_quats(R: np.ndarray) -> np.ndarray:
    """(N,3,3) rotation matrices -> (N,4) xyzw quaternions (w>=0)."""
    # fix improper rotations from eigh (det -1)
    det = np.linalg.det(R)
    R = R.copy()
    R[det < 0, :, 2] *= -1.0
    N = R.shape[0]
    q = np.zeros((N, 4), dtype=np.float32)
    t = np.trace(R, axis1=1, axis2=2)
    w = np.sqrt(np.maximum(1.0 + t, 1e-12)) / 2.0
    q[:, 3] = w
    q[:, 0] = (R[:, 2, 1] - R[:, 1, 2]) / np.maximum(4 * w, 1e-9)
    q[:, 1] = (R[:, 0, 2] - R[:, 2, 0]) / np.maximum(4 * w, 1e-9)
    q[:, 2] = (R[:, 1, 0] - R[:, 0, 1]) / np.maximum(4 * w, 1e-9)
    n = np.linalg.norm(q, axis=1, keepdims=True)
    return q / np.maximum(n, 1e-9)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("splat_npz")
    p.add_argument("out_rrd")
    p.add_argument("--trajectory", default=None)
    args = p.parse_args(argv)
    export_rrd(args.splat_npz, args.out_rrd, args.trajectory)
    print(f"wrote {args.out_rrd}")


if __name__ == "__main__":
    main()
