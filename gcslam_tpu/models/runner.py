"""Run driver: stream scans through the jitted step, or lax.scan a whole bag.

Replaces the reference's ROS node + worker threads (backend_node.py:1340-1388):
the frontend is an offline reader producing fixed-shape ScanBatches; the
device does everything else. Two modes:
  - run_scan(): the entire bag as one lax.scan — maximal fusion, used by the
    benchmark and sweeps;
  - run_stream(): host loop calling the jitted step per scan — the streaming/
    online mode (double-buffered host->device transfer handled by JAX's async
    dispatch).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

from gcslam_tpu.utils.xla import jax
from gcslam_tpu.models.config import PipelineConfig
from gcslam_tpu.models.scan_io import ScanBatch, stack_scan_batches
from gcslam_tpu.models.scan_step import StepState, StepOutput, init_state, scan_step


@functools.partial(jax.jit, static_argnames=("config",))
def _step_jit(state: StepState, batch: ScanBatch, config: PipelineConfig):
    return scan_step(state, batch, config)


@functools.partial(jax.jit, static_argnames=("config",))
def run_scan(state0: StepState, batches: ScanBatch, config: PipelineConfig):
    """Whole-bag lax.scan: batches have a leading time axis."""
    return jax.lax.scan(lambda s, b: scan_step(s, b, config), state0, batches)


def run_stream(
    batches: List[ScanBatch],
    config: PipelineConfig,
    state: StepState | None = None,
    loop_detector=None,
    map_stream_dir: str | None = None,
    map_stream_every: int = 20,
) -> Tuple[StepState, StepOutput]:
    """Host streaming loop over the jitted step; returns final state and
    stacked outputs (poses/tape gathered on device, one transfer at the end).

    `loop_detector` (frontend.loop.LoopDetector) enables loop-closure
    production: detection runs host-side between steps (this is the online
    mode — run_bag's single lax.scan cannot take host feedback), factors are
    injected into the batch's loop channel and consumed by the always-compiled
    in-graph loop evidence (weight 0 when absent), so enabling loops causes
    NO recompilation.

    `map_stream_dir` enables the incremental map stream — the offline
    replacement for the reference's live /gc/map publisher
    (backend/map_publisher.py:90): every `map_stream_every` scans the atlas
    is exported as a splat snapshot `map_NNNNNN.npz` plus an index line in
    `map_stream.jsonl` (scan index, stamp, splat count, file)."""
    import numpy as np

    config.validate()
    if state is None:
        state = init_state(config)
    stream_idx_f = None
    if map_stream_dir is not None and config.with_map:
        import os

        os.makedirs(map_stream_dir, exist_ok=True)
        stream_idx_f = open(f"{map_stream_dir}/map_stream.jsonl", "w")
    outs = []
    pose_prev = np.zeros(6)
    for i, batch in enumerate(batches):
        if loop_detector is not None and i > 0:
            hit = loop_detector.detect(
                i, pose_prev, np.asarray(batch.points), np.asarray(batch.point_weights)
            )
            if hit is not None:
                lp, lc, lw = hit
                batch = batch._replace(
                    loop_pose=jax.numpy.asarray(lp, dtype=batch.loop_pose.dtype),
                    loop_cov=jax.numpy.asarray(lc, dtype=batch.loop_cov.dtype),
                    loop_weight=jax.numpy.asarray(lw, dtype=batch.loop_weight.dtype),
                )
        state, out = _step_jit(state, batch, config)
        outs.append(out)
        if loop_detector is not None:
            pose_prev = np.asarray(out.pose)
            pose_cov = None
            if i % loop_detector.cfg.keyframe_every == 0:
                from gcslam_tpu.ops import linalg as _linalg
                import gcslam_tpu.constants as _C

                b0 = jax.tree_util.tree_map(lambda x: x[0], state.beliefs)
                Sig, _ = _linalg.spd_inverse_lifted(b0.L, config.eps_lift)
                pose_cov = np.asarray(Sig)[_C.IDX_POSE, _C.IDX_POSE]
            loop_detector.store(
                i, pose_prev, np.asarray(batch.points), np.asarray(batch.point_weights),
                pose_cov,
            )
        if stream_idx_f is not None and (i % map_stream_every == 0 or i == len(batches) - 1):
            import json

            from gcslam_tpu.outputs.splat_export import save_splat_export

            snap = f"{map_stream_dir}/map_{i:06d}.npz"
            n_splats = save_splat_export(snap, state.atlas)
            stream_idx_f.write(json.dumps({
                "scan": i, "stamp": float(out.stamp), "n_splats": n_splats,
                "file": snap.rsplit("/", 1)[-1],
            }) + "\n")
            stream_idx_f.flush()
    if stream_idx_f is not None:
        stream_idx_f.close()
    stacked = jax.tree_util.tree_map(lambda *xs: jax.numpy.stack(xs), *outs)
    return state, stacked


def run_bag(
    batches: List[ScanBatch], config: PipelineConfig, state: StepState | None = None
) -> Tuple[StepState, StepOutput]:
    """Stack + lax.scan the whole bag (fastest replay path)."""
    config.validate()
    if state is None:
        state = init_state(config)
    stacked_batches = stack_scan_batches(batches)
    return run_scan(state, stacked_batches, config)
