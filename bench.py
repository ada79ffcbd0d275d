"""Benchmark: steady-state per-scan latency of the full GC pipeline on the
real TPU, against the reference's ~1.5 s/scan (BASELINE.md: 1-2 s/scan on a
dev GPU; north star <= 5 ms/scan).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = reference_ms / ours_ms (speedup factor, higher is better).
"""

import json
import os
import sys
import time

REFERENCE_MS_PER_SCAN = 1500.0

# Production TPU precision: f32 belief algebra (absolute stamps stay f64 via
# TIME_DTYPE). On TPU f64 is software-emulated — f32 cuts cold compile ~11x
# (824 s -> ~75 s) at accuracy gated by tests/test_precision.py. Override
# with GCSLAM_BELIEF_DTYPE=float64 for the reference-parity mode.
os.environ.setdefault("GCSLAM_BELIEF_DTYPE", "float32")


def main() -> None:
    import jax

    # Persistent compilation cache: the full-pipeline XLA compile is ~10 min
    # (remote AOT); cache it across bench invocations.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import numpy as np
    import gcslam_tpu  # noqa: F401 (x64 on)
    from gcslam_tpu.models.config import PipelineConfig
    from gcslam_tpu.models import runner
    from gcslam_tpu.models.scan_step import init_state
    from gcslam_tpu.frontend.synthetic import generate, SyntheticConfig

    # Production budgets (reference runtime config: 8192 pts, 512 surfels,
    # config/gc_unified.yaml:65-70), full map path, K_HYP=4.
    cfg = PipelineConfig(
        with_map=True,
        atlas_max_tiles=64,
        m_tile=1024,
        m_tile_view=256,
        n_surfel=512,
        surfel_voxel_size_m=0.3,
    )
    cfg.validate()
    n_scans = 50
    run = generate(SyntheticConfig(n_scans=n_scans, n_points=8192))

    # --- headline: whole-bag replay (lax.scan, ONE device dispatch) -------
    # This is the production batched-replay shape (parallel/sweep.py): the
    # per-scan device time with no host round trips. Through the remote-TPU
    # tunnel a per-step host loop measures mostly RPC latency (~0.8 ms vs
    # ~0.01 ms device time), so both are reported.
    from gcslam_tpu.models.scan_io import stack_scan_batches

    batches = stack_scan_batches(run.batches)
    state0 = init_state(cfg)
    scan_fn = jax.jit(lambda s, b: runner.run_scan(s, b, cfg))
    t0 = time.time()
    state, out = scan_fn(state0, batches)
    jax.block_until_ready(out.pose)
    compile_s = time.time() - t0
    t0 = time.time()
    state, out = scan_fn(state0, batches)
    jax.block_until_ready(out.pose)
    ms_per_scan = (time.time() - t0) / n_scans * 1000.0

    poses = np.asarray(out.pose)
    poses_ok = bool(np.all(np.isfinite(poses)))
    # accuracy sanity: the estimate must actually track the rig
    track_err = float(np.linalg.norm(poses[-1, :2] - run.gt_poses[n_scans - 1][:2]))

    # --- streaming mode: host loop calling the jitted step per scan -------
    state_s = init_state(cfg)
    for b in run.batches[:3]:
        state_s, out_s = runner._step_jit(state_s, b, cfg)
    jax.block_until_ready(out_s.pose)
    t0 = time.time()
    for b in run.batches[3:23]:
        state_s, out_s = runner._step_jit(state_s, b, cfg)
    jax.block_until_ready(out_s.pose)
    stream_ms = (time.time() - t0) / 20 * 1000.0

    result = {
        "metric": "ms_per_scan_full_pipeline",
        "value": round(ms_per_scan, 4),
        "unit": "ms/scan",
        "vs_baseline": round(REFERENCE_MS_PER_SCAN / max(ms_per_scan, 1e-9), 1),
    }
    print(json.dumps(result))
    from gcslam_tpu.utils.xla import BELIEF_DTYPE, jnp

    print(
        f"# device={jax.devices()[0].platform} belief_dtype={jnp.dtype(BELIEF_DTYPE)} "
        f"compile={compile_s:.0f}s finite={poses_ok} replay_ms={ms_per_scan:.4f} "
        f"stream_ms={stream_ms:.3f} (incl. per-step dispatch) "
        f"scans/s={1000.0 / ms_per_scan:.0f} xy_err_last={track_err:.3f}m",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
