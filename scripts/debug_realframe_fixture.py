"""Tune the real-frame fixture: how much luminance smoothing / how many
bands make the KDE pipeline genuinely denoise the interior?"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import jax.numpy as jnp

from kinectdepthmapenhancement_tpu.core.camera import default_kinect_intrinsics
from kinectdepthmapenhancement_tpu.core.config import KDEConfig
from kinectdepthmapenhancement_tpu.core.io import imread_rgb
from kinectdepthmapenhancement_tpu.models import pipelines

color = imread_rgb("/root/reference/input/color.jpg")
h, w = color.shape[:2]
intr = default_kinect_intrinsics(w, h)
cfg = KDEConfig()
step = jax.jit(
    lambda d, c: pipelines.kde_pipeline(d, c, intr, cfg).optimized_points
)
cj = jnp.asarray(color)

lum = np.asarray(color, np.float32).mean(-1)


def smooth(x, scale):
    # downsample by `scale` then upsample: cheap large-sigma smoothing
    small = jax.image.resize(jnp.asarray(x), (h // scale, w // scale), "linear")
    return np.asarray(jax.image.resize(small, (h, w), "linear"))


for scale, nbands in [(16, 5), (32, 5), (32, 3), (48, 3)]:
    ls = smooth(lum, scale)
    qs = np.quantile(ls, np.linspace(0, 1, nbands + 1)[1:-1])
    bands = np.digitize(ls, qs)
    zs = np.linspace(1500.0, 3600.0, nbands).astype(np.float32)
    gt = np.take(zs, bands)
    rng = np.random.default_rng(11)
    var = 0.45 * 2.85 * np.square(gt / 10.0) / 1.0e4
    noisy = (gt + rng.uniform(-1.0, 1.0, gt.shape) * var).astype(np.float32)

    out = np.asarray(step(jnp.asarray(noisy), cj))[..., 2]

    gy, gx = np.gradient(gt)
    edge = (np.abs(gy) + np.abs(gx)) > 1.0
    interior = ~edge
    for _ in range(3):
        e = interior
        interior = (
            e & np.roll(e, 1, 0) & np.roll(e, -1, 0)
            & np.roll(e, 1, 1) & np.roll(e, -1, 1)
        )
    rm_in = np.sqrt(np.mean((noisy - gt)[interior] ** 2))
    rm_out = np.sqrt(np.mean((out - gt)[interior] ** 2))
    rm_all_in = np.sqrt(np.mean((noisy - gt) ** 2))
    rm_all_out = np.sqrt(np.mean((out - gt) ** 2))
    print(
        f"scale={scale:2d} bands={nbands}  interior_frac={interior.mean():.2f}  "
        f"rm_in={rm_in:6.2f} rm_out={rm_out:6.2f}  "
        f"(all px: {rm_all_in:6.2f} -> {rm_all_out:6.2f})",
        flush=True,
    )
