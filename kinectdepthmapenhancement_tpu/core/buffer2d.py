"""Temporal weighted depth accumulation (pseudo-ground-truth capture).

Replaces ArrayBuffer/Buffer2D (reference ArrayBuffer/Buffer2D.cu:13-30):
a per-pixel {depth, weight} state updated with a TSDF-style running weighted
average, gated on agreement between the incoming and stored depth.

The reference's update rule (updateWaitedDepth, Buffer2D.cu:13-30):
    if d > 50:
        if stored.d != 0 and |int(stored.d) - int(d)| < d * 0.01:
            stored.d = (stored.d*(w+1) + d*w) / (2w + 1);  w += 1
        elif stored.d == 0:
            stored.d = d; w = 1
(disagreeing samples are simply dropped).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

VALID_DEPTH_MM = 50.0  # global invalid-depth sentinel threshold


class DepthBuffer(NamedTuple):
    depth: jnp.ndarray   # [H, W] f32, mm; 0 = empty
    weight: jnp.ndarray  # [H, W] f32


def init(height: int, width: int) -> DepthBuffer:
    z = jnp.zeros((height, width), jnp.float32)
    return DepthBuffer(depth=z, weight=z)


def insert(buf: DepthBuffer, depth: jnp.ndarray) -> DepthBuffer:
    """Unconditional overwrite (insertDataKernel, Buffer2D.cu:33-56)."""
    return DepthBuffer(depth=depth, weight=jnp.ones_like(depth))


def update(buf: DepthBuffer, depth: jnp.ndarray) -> DepthBuffer:
    """Gated weighted-average update (Buffer2D.cu:13-30)."""
    d, w = buf.depth, buf.weight
    valid_new = depth > VALID_DEPTH_MM
    # the reference truncates both depths to int before differencing
    agree = jnp.abs(jnp.trunc(d) - jnp.trunc(depth)) < depth * 0.01
    has_old = d != 0.0

    merged_d = (d * (w + 1.0) + depth * w) / (w * 2.0 + 1.0)
    take_merge = valid_new & has_old & agree
    take_init = valid_new & ~has_old

    new_d = jnp.where(take_merge, merged_d, jnp.where(take_init, depth, d))
    new_w = jnp.where(take_merge, w + 1.0, jnp.where(take_init, 1.0, w))
    return DepthBuffer(depth=new_d, weight=new_w)


@jax.jit
def accumulate(buf: DepthBuffer, frames: jnp.ndarray) -> DepthBuffer:
    """Fold a stack of frames [N, H, W] through `update` (capture loop,
    main.cpp:86-116 runs 1000 live frames through Buffer2D::updateData)."""

    def step(b, frame):
        return update(b, frame), None

    out, _ = jax.lax.scan(step, buf, frames)
    return out


def synthetic_noise(
    key: jax.Array, ground_truth: jnp.ndarray
) -> jnp.ndarray:
    """Kinect-like depth noise from the reference's (commented) generator
    (main.cpp:127-130): variance = 0.45*2.85*(z/10)^2 / 1e4 mm, noise uniform
    in [-variance, +variance)."""
    variance = 0.45 * 2.85 * jnp.square(ground_truth / 10.0) / 1.0e4
    u = jax.random.uniform(key, ground_truth.shape, minval=-1.0, maxval=1.0)
    return ground_truth + u * variance
