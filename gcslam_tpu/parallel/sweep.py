"""Pod-scale batched replay: shard independent SLAM runs over a device mesh.

The reference is a single-process single-device engine (SURVEY.md 2.10); its
only parallelism is a Python loop over K_HYP. The TPU-native scale-out story
is REPLAY SWEEPS: hypotheses x bags x noise-prior settings as a batch of
independent filter states, sharded across ICI with `jax.sharding`:

  - mesh axis "run": data-parallel independent replays (bags / seeds /
    prior settings). Each device advances its own filter; zero
    communication inside a step.
  - cross-run summaries (mean/max pose spread, certificate aggregates)
    are computed with jnp reductions over the sharded axis — XLA inserts
    the all-reduces over ICI.

`sweep_step` is the FULL training/inference step the driver dry-runs on a
virtual multi-device CPU mesh (see __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

from gcslam_tpu.utils.xla import jax, jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcslam_tpu.models.config import PipelineConfig
from gcslam_tpu.models.scan_io import ScanBatch
from gcslam_tpu.models.scan_step import StepState, init_state, scan_step


def make_mesh(n_devices: int | None = None, axis: str = "run") -> Mesh:
    devs = jax.devices()[: (n_devices or len(jax.devices()))]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_map(n_run: int, n_map: int) -> Mesh:
    """2-D mesh ("run", "map"): the atlas TILE axis shards over "map" so the
    device-resident map scales beyond one chip's HBM (the reference's
    unbounded dict-of-tiles has no analog; this is the pod-scale version of
    its tile table). View extraction / fuse / insert gathers and scatters
    against the sharded tile table become GSPMD collectives; the rest of the
    filter state is replicated along "map". n_map must divide
    atlas_max_tiles."""
    devs = jax.devices()[: n_run * n_map]
    if len(devs) < n_run * n_map:
        raise ValueError(f"need {n_run * n_map} devices, have {len(devs)}")
    return Mesh(np.asarray(devs).reshape(n_run, n_map), ("run", "map"))


def make_mesh_2d(n_run: int, n_hyp: int) -> Mesh:
    """2-D mesh ("run", "hyp"): data-parallel replays x model-parallel
    hypotheses. The K_HYP axis of the belief stack shards over "hyp"; the
    cross-hypothesis reductions (weight normalization, barycenter einsum,
    IW suffstat averaging) become XLA all-reduces over the hyp axis of the
    mesh — laid out on ICI next to the run axis. n_hyp must divide K_HYP."""
    devs = jax.devices()[: n_run * n_hyp]
    if len(devs) < n_run * n_hyp:
        raise ValueError(f"need {n_run * n_hyp} devices, have {len(devs)}")
    return Mesh(np.asarray(devs).reshape(n_run, n_hyp), ("run", "hyp"))


def batched_init_state(config: PipelineConfig, n_runs: int) -> StepState:
    """Stack n_runs independent initial states along a leading run axis."""
    s0 = init_state(config)
    return jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (n_runs,) + x.shape), s0)


@functools.partial(jax.jit, static_argnames=("config",))
def sweep_step(states: StepState, batches: ScanBatch, config: PipelineConfig):
    """One scan for EVERY run in the sweep (leading run axis on both args),
    plus cross-run aggregates (all-reduced over the mesh when sharded)."""
    states_new, outs = jax.vmap(lambda s, b: scan_step(s, b, config))(states, batches)
    pose_mean = jnp.mean(outs.pose, axis=0)
    pose_spread = jnp.max(jnp.linalg.norm(outs.pose[:, :3] - pose_mean[None, :3], axis=-1))
    return states_new, outs, {"pose_mean": pose_mean, "pose_spread": pose_spread}


def shard_states(states: StepState, mesh: Mesh, axis: str = "run") -> StepState:
    """1-D run sharding; on a 2-D ("run", "hyp") mesh the hypothesis axis of
    the belief stack (and hyp_weights) additionally shards over "hyp"."""
    run = NamedSharding(mesh, P(axis))
    if "map" in mesh.axis_names:
        # atlas leaves are (R, T, ...): tile axis T shards over "map";
        # everything else replicates along "map".
        run_map = NamedSharding(mesh, P(axis, "map"))
        atlas = states.atlas
        if atlas is not None:
            atlas = type(atlas)(*[
                jax.device_put(x, run if jnp.ndim(x) < 2 else run_map)
                for x in atlas
            ])
        rest = states._replace(atlas=None)
        rest = jax.tree_util.tree_map(lambda x: jax.device_put(x, run), rest)
        return rest._replace(atlas=atlas)
    if "hyp" in mesh.axis_names:
        run_hyp = NamedSharding(mesh, P(axis, "hyp"))
        beliefs = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, run_hyp), states.beliefs
        )
        hyp_w = jax.device_put(states.hyp_weights, run_hyp)
        rest = states._replace(beliefs=None, hyp_weights=None)
        rest = jax.tree_util.tree_map(lambda x: jax.device_put(x, run), rest)
        return rest._replace(beliefs=beliefs, hyp_weights=hyp_w)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, run), states)


def shard_batches(batches: ScanBatch, mesh: Mesh, axis: str = "run") -> ScanBatch:
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batches)
