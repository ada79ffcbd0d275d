"""Checkpoint / resume: the whole filter state is one pytree, so persistence
is a flat npz (the reference has NO live-state checkpointing — only artifact
exports at shutdown, SURVEY.md section 5; here resume is first-class)."""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
from gcslam_tpu.utils.xla import jnp


def save_state(path: str, state: Any) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrs["__treedef__"] = np.frombuffer(str(treedef).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrs)


def load_state(path: str, like: Any) -> Any:
    """Restore into the structure of `like` (an initialized StepState)."""
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    leaves = []
    for i, ref in enumerate(leaves_like):
        arr = data[f"leaf_{i}"]
        leaves.append(jnp.asarray(arr, dtype=ref.dtype))
        if arr.shape != ref.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected {ref.shape} "
                "(config mismatch)"
            )
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# Sharded checkpointing (orbax): multi-chip states (run/hyp/map-sharded
# sweeps, parallel/sweep.py) save and restore WITH their shardings — the
# npz path above gathers to host and loses placement. Resume on a different
# mesh works by passing that mesh's target state as `like`.
# ---------------------------------------------------------------------------


def save_state_sharded(path: str, state: Any) -> None:
    """Orbax save of a (possibly sharded) StepState pytree. `path` must be
    a fresh directory (absolute)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)


def load_state_sharded(path: str, like: Any) -> Any:
    """Restore with the shardings/dtypes/shapes of `like` (e.g. an
    initialized+sharded sweep state on the target mesh)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target=like)
