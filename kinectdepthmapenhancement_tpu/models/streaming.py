"""Streaming sequence runner: frames -> pipeline -> metrics, resumable.

The reference's only multi-frame mode is the 1000-frame ground-truth capture
loop (main.cpp:86-116).  This runner generalises it for production use:
  * pulls frames from any iterator (e.g. the native C++ FrameSource),
  * runs the KDE pipeline (batched; batch dim amortises dispatch overhead),
  * maintains the temporal DepthBuffer accumulation,
  * accumulates mean-3D-error metrics against the running buffer,
  * checkpoints cursor + buffer + metrics every `checkpoint_every` frames so
    a killed run resumes where it left off (utils/checkpoint.py).
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kinectdepthmapenhancement_tpu.core import buffer2d
from kinectdepthmapenhancement_tpu.core.camera import Intrinsics, projective_to_real
from kinectdepthmapenhancement_tpu.core.config import KDEConfig
from kinectdepthmapenhancement_tpu.models.pipelines import kde_pipeline
from kinectdepthmapenhancement_tpu.utils import checkpoint, metrics


def run_stream(
    frames: Iterator[np.ndarray],
    color: np.ndarray,
    intr: Intrinsics,
    *,
    cfg: KDEConfig = KDEConfig(),
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 50,
    max_frames: Optional[int] = None,
) -> checkpoint.StreamState:
    """Process a depth-frame stream with a fixed colour image (file-replay
    style).  Returns the final StreamState with accumulated metrics."""
    h, w = color.shape[:2]
    state = checkpoint.load(checkpoint_path) if checkpoint_path else None
    if state is None:
        state = checkpoint.StreamState(
            frame_index=0,
            buffer=buffer2d.init(h, w),
            metric_sums={"kde_error_mm": 0.0},
            metric_counts={"kde_error_mm": 0},
        )

    c = jnp.asarray(color)

    @jax.jit
    def step(buf: buffer2d.DepthBuffer, depth: jnp.ndarray):
        buf = buffer2d.update(buf, depth)
        res = kde_pipeline(depth, c, intr, cfg)
        ref_pts = projective_to_real(buf.depth, intr)
        err, n = metrics.mean_3d_error(res.optimized_points, ref_pts)
        return buf, err, n

    for i, frame in enumerate(frames):
        if i < state.frame_index:
            continue  # fast-forward after resume
        if max_frames is not None and i >= max_frames:
            break
        buf, err, n = step(state.buffer, jnp.asarray(frame))
        state.buffer = buf
        state.metric_sums["kde_error_mm"] += float(err) * float(n)
        state.metric_counts["kde_error_mm"] += int(n)
        state.frame_index = i + 1
        if checkpoint_path and state.frame_index % checkpoint_every == 0:
            checkpoint.save(checkpoint_path, state)

    if checkpoint_path:
        checkpoint.save(checkpoint_path, state)
    return state


def mean_metric(state: checkpoint.StreamState, name: str) -> float:
    n = state.metric_counts.get(name, 0)
    return state.metric_sums.get(name, 0.0) / n if n else float("nan")
