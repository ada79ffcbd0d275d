"""Diagnostics persistence: the per-scan ScanTape (stacked by lax.scan) to
npz + trigger decoding (reference backend/diagnostics.py:19-329 +
diagnostics.npz export backend_node.py:2356-2369)."""

from __future__ import annotations

import json
from typing import Dict

import numpy as np

from gcslam_tpu.ops.certs import decode_triggers


def tape_to_dict(tape) -> Dict[str, np.ndarray]:
    return {f: np.asarray(getattr(tape, f)) for f in tape._fields}


def save_diagnostics_npz(path: str, tape, poses=None, stamps=None) -> None:
    data = tape_to_dict(tape)
    if poses is not None:
        data["poses"] = np.asarray(poses)
    if stamps is not None:
        data["stamps"] = np.asarray(stamps)
    np.savez_compressed(path, **data)


def trigger_history(tape) -> list:
    """Decode the per-scan trigger bitmasks into name lists."""
    masks = np.asarray(tape.cert_triggers)
    return [decode_triggers(int(m)) for m in masks]


def summary_json(tape) -> str:
    d = tape_to_dict(tape)
    out = {}
    for k, v in d.items():
        if v.dtype.kind == "f":
            out[k] = {
                "mean": float(np.mean(v)),
                "last": float(v[-1]),
                "max": float(np.max(v)),
            }
    out["triggers_seen"] = sorted(
        set(t for names in trigger_history(tape) for t in names)
    )
    return json.dumps(out, indent=2, sort_keys=True)
