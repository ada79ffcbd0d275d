"""Per-topic time alignment: offset + drift vs the LiDAR reference clock
(reference config/time_alignment/*.yaml + frontend/sensors/time_alignment.py
+ tools/compute_time_alignment.py).

aligned_t = t * (1 + drift) + offset
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict

import numpy as np


@dataclasses.dataclass(frozen=True)
class TopicAlignment:
    offset_sec: float = 0.0
    drift: float = 0.0

    def apply(self, t: np.ndarray) -> np.ndarray:
        return np.asarray(t) * (1.0 + self.drift) + self.offset_sec


def load_alignment(path: str) -> Dict[str, TopicAlignment]:
    """Load a {topic: {offset_sec, drift}} JSON/YAML-subset profile."""
    with open(path) as f:
        raw = json.load(f)
    return {k: TopicAlignment(**v) for k, v in raw.items()}


def estimate_offset(t_a: np.ndarray, t_b: np.ndarray) -> float:
    """Median stamp offset between two roughly-corresponding streams —
    the simple estimator behind tools/compute_time_alignment.py."""
    n = min(len(t_a), len(t_b))
    if n == 0:
        return 0.0
    return float(np.median(np.asarray(t_b)[:n] - np.asarray(t_a)[:n]))
