"""Device-mesh construction for batch ('data') x spatial ('x') parallelism.

The reference is single-process single-GPU (SURVEY.md §2); the only
parallelism this workload needs is frames across devices/hosts (data) and
image-plane tiling within a group (spatial), so meshes here have two axes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, spatial: int = 1) -> Mesh:
    """Mesh over ('data', 'x'): `spatial` devices on the image axis, the rest
    on the batch axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % spatial != 0:
        raise ValueError(f"{n} devices not divisible by spatial={spatial}")
    arr = np.array(devices).reshape(n // spatial, spatial)
    return Mesh(arr, ("data", "x"))
