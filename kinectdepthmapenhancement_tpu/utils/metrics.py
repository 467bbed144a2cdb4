"""Evaluation metrics and timing harness.

Replaces main.cpp's evaluation loop (main.cpp:217-309: per-method mean 3-D
Euclidean error vs. the temporally averaged buffer, over pixels where both
depths lie in (50, 15000) mm) and the clock()-based stage timing
(main.cpp:158-201) — on device, jittable, plus a block_until_ready harness.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

VALID_MIN = 50.0
VALID_MAX = 15000.0


def mean_3d_error(
    points: jnp.ndarray, reference_points: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean ||p - p_ref|| over pixels where BOTH z's are in (50, 15000) mm
    (main.cpp:302-309).  Returns (mean_error_mm, count)."""
    z = points[..., 2]
    zr = reference_points[..., 2]
    valid = (z > VALID_MIN) & (z < VALID_MAX) & (zr > VALID_MIN) & (zr < VALID_MAX)
    err = jnp.sqrt(jnp.sum(jnp.square(points - reference_points), axis=-1))
    count = jnp.sum(valid)
    total = jnp.sum(jnp.where(valid, err, 0.0))
    return total / jnp.maximum(count, 1), count


def depth_rmse(depth: jnp.ndarray, reference: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel depth RMSE (mm) over jointly valid pixels."""
    valid = (
        (depth > VALID_MIN)
        & (depth < VALID_MAX)
        & (reference > VALID_MIN)
        & (reference < VALID_MAX)
    )
    se = jnp.where(valid, jnp.square(depth - reference), 0.0)
    return jnp.sqrt(jnp.sum(se) / jnp.maximum(jnp.sum(valid), 1))


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10) -> Dict[str, float]:
    """Wall-clock a jitted function with block_until_ready (the TPU analog of
    the reference's clock() deltas around kernel launches)."""
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "fps": 1.0 / dt if dt > 0 else float("inf")}
