"""f32-belief precision mode (GCSLAM_BELIEF_DTYPE=float32).

On TPU, f64 is software-emulated: measured 18x XLA compile-time multiplier
(518 s vs 29 s for the no-map core) and slower small-matrix runtime. The
anchor-chart design keeps belief increments near zero, which makes f32
viable; absolute stamps stay f64 (TIME_DTYPE) so epoch-scale clocks
(~1.7e9 s) keep microsecond resolution.

The dtype binds at package import, so the f32 run happens in a subprocess.
"""

import json
import os
import subprocess
import sys

import numpy as np

_RUNNER = r"""
import os, json, sys
import jax
jax.config.update("jax_platforms", "cpu")
import gcslam_tpu
import numpy as np
from gcslam_tpu.utils.xla import BELIEF_DTYPE, TIME_DTYPE, jnp
from gcslam_tpu.models.config import PipelineConfig
from gcslam_tpu.models import runner
from gcslam_tpu.frontend.synthetic import generate, SyntheticConfig

cfg = PipelineConfig(with_map=True, atlas_max_tiles=16, m_tile=128,
                     m_tile_view=64, n_surfel=128, surfel_voxel_size_m=0.5)
# epoch-scale clock: exercises the TIME_DTYPE (f64 stamps) contract
run = generate(SyntheticConfig(n_scans=30, n_points=512, t0=1.7e9))
state, out = runner.run_bag(run.batches, cfg)
poses = np.asarray(out.pose)
gt = run.gt_poses[: poses.shape[0]]
err = np.linalg.norm(poses[:, :2] - gt[:, :2], axis=1)
print(json.dumps({
    "dtype": str(jnp.dtype(BELIEF_DTYPE)),
    "time_dtype": str(jnp.dtype(TIME_DTYPE)),
    "finite": bool(np.all(np.isfinite(poses))),
    "xy_rmse": float(np.sqrt((err ** 2).mean())),
    "xy_last": float(err[-1]),
}))
"""


def _run(belief_dtype: str) -> dict:
    env = dict(os.environ)
    env["GCSLAM_BELIEF_DTYPE"] = belief_dtype
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER], env=env, capture_output=True, text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_f32_belief_mode_tracks_with_epoch_stamps():
    r32 = _run("float32")
    assert r32["dtype"] == "float32"
    assert r32["time_dtype"] == "float64"  # stamps stay f64 regardless
    assert r32["finite"]
    assert r32["xy_last"] < 0.5, r32

    r64 = _run("float64")
    assert r64["finite"]
    # f32 degradation is bounded: within 3 cm + 2x of the f64 error
    assert r32["xy_rmse"] < 2.0 * r64["xy_rmse"] + 0.03, (r32, r64)
