"""Camera model: projective (u, v, z[mm]) <-> real-world (X, Y, Z[mm]).

Replaces the reference's DimensionConvertor (thrust transforms,
reference DimensionConvertor/DimensionConvertor.h:19-148) and the precomputed
normalised-ray map of Projection_GPU (Projection_GPU/Projection_GPU.cu:3-19).

Coordinate convention (reference DimensionConvertor.h:36-43):
    X = (u - cx) / fx * z
    Y = (cy - v) / fy * z        # note the y-axis flip
    Z = z                        # millimetres
Every pixel is converted, including invalid ones (z == 0 maps to the origin).

Intrinsics come from OpenNI ZPD/ZPPS on the real sensor:
fx = fy = F / (2 * pixel_size), cx = W/2, cy = H/2 (reference Kinect/Kinect.cpp:89-95).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Intrinsics(NamedTuple):
    """Pinhole intrinsics.  Plain floats so it is a static jit argument."""

    fx: float
    fy: float
    cx: float
    cy: float

    @property
    def matrix(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float64,
        )


# Kinect v1 frame geometry (reference Kinect/Kinect.cpp:10-11).
KINECT_WIDTH = 640
KINECT_HEIGHT = 480


def default_kinect_intrinsics(
    width: int = KINECT_WIDTH, height: int = KINECT_HEIGHT
) -> Intrinsics:
    """Typical Kinect v1 intrinsics (ZPD=120mm, ZPPS≈0.1042mm -> f≈575.8).

    The reference derives fx = fy = ZPD / (2*ZPPS) at runtime from the sensor
    (Kinect/Kinect.cpp:89-95); 575.8157 is the widely used OpenNI default.
    """
    f = 575.8157349582916
    return Intrinsics(fx=f, fy=f, cx=width / 2.0, cy=height / 2.0)


def normalized_rays(intr: Intrinsics, height: int, width: int) -> jnp.ndarray:
    """Unit-z ray map [H, W, 3]: (rx, ry, 1) with rx=(u-cx)/fx, ry=(cy-v)/fy.

    Mirrors Projection_GPU's Normalized3D map (Projection_GPU.cu:3-19): a
    point at depth z along the ray is (rx*z, ry*z, z).
    """
    u = jnp.arange(width, dtype=jnp.float32)[None, :]
    v = jnp.arange(height, dtype=jnp.float32)[:, None]
    rx = jnp.broadcast_to((u - intr.cx) / intr.fx, (height, width))
    ry = jnp.broadcast_to((intr.cy - v) / intr.fy, (height, width))
    ones = jnp.ones((height, width), dtype=jnp.float32)
    return jnp.stack([rx, ry, ones], axis=-1)


def projective_to_real(depth: jnp.ndarray, intr: Intrinsics) -> jnp.ndarray:
    """Depth map [H, W] (mm) -> point map [H, W, 3] (mm).

    Reference: DimensionConvertor.h:36-43 / DimensionConvertor.cu:3-43.
    z==0 (invalid) maps to (0, 0, 0), matching the thrust transform which
    converts every pixel unconditionally.
    """
    h, w = depth.shape
    rays = normalized_rays(intr, h, w)
    return rays * depth[..., None]


def real_to_projective(points: jnp.ndarray, intr: Intrinsics) -> jnp.ndarray:
    """Point map [..., 3] (mm) -> (u, v, z).

    Reference convert_rtp (DimensionConvertor.h:122-148): points with
    |z| < 1 get sentinel (u, v) = (-1, -1).
    """
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1.0, 1.0, z)
    u = x / safe_z * intr.fx + intr.cx
    v = intr.cy - y / safe_z * intr.fy
    bad = jnp.abs(z) < 1.0
    u = jnp.where(bad, -1.0, u)
    v = jnp.where(bad, -1.0, v)
    return jnp.stack([u, v, z], axis=-1)
