"""Honest device timing under runtimes with aggressive result caching.

The axon PJRT backend memoizes (executable, input buffers) pairs and its
block_until_ready can return optimistically, so naive repeat-timing reports
fantasy numbers.  `time_pipeline` defeats both: every timed call gets an
input with fresh, unique contents, and completion is forced by reading back
a scalar reduction of the output (the bytes cannot exist before the
computation does).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def time_pipeline(
    fn: Callable,
    make_args: Callable[[int], Sequence],
    *,
    iters: int = 5,
) -> Dict[str, float]:
    """fn(*args) -> array (any shape).  make_args(i) must return freshly
    uniquified device inputs for iteration i (i == -1 for warmup)."""
    red = jax.jit(lambda *a: jnp.sum(fn(*a)))
    float(red(*make_args(-1)))  # compile + warm
    times = []
    for i in range(iters):
        args = make_args(i)
        for a in args:
            jax.block_until_ready(a)
        t0 = time.perf_counter()
        float(red(*args))  # scalar readback forces real completion
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    return {
        "median_s": med,
        "min_s": float(np.min(times)),
        "fps": 1.0 / med if med > 0 else float("inf"),
    }
