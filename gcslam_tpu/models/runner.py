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
    batches: List[ScanBatch], config: PipelineConfig, state: StepState | None = None
) -> Tuple[StepState, StepOutput]:
    """Host streaming loop over the jitted step; returns final state and
    stacked outputs (poses/tape gathered on device, one transfer at the end)."""
    config.validate()
    if state is None:
        state = init_state(config)
    outs = []
    for batch in batches:
        state, out = _step_jit(state, batch, config)
        outs.append(out)
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
