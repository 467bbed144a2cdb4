"""TPU-chip check: pallas cov kernel parity + timing vs XLA path at 640x480."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from kinectdepthmapenhancement_tpu.core.camera import (
    default_kinect_intrinsics,
    projective_to_real,
)
from kinectdepthmapenhancement_tpu.core.config import NormalParams
from kinectdepthmapenhancement_tpu.core.testdata import make_noisy_scene
from kinectdepthmapenhancement_tpu.ops import normals

H, W = 480, 640
LO, HI = 3, 9


def chained_time(stage, inputs, reps=3):
    def runner(k_static):
        def body(i, carry):
            args = list(carry)
            out = stage(*args)
            s = jnp.sum(out.astype(jnp.float32)) * 1e-30
            args[0] = args[0] + s.astype(args[0].dtype)
            return tuple(args)

        def fn(*args):
            final = jax.lax.fori_loop(0, k_static, body, tuple(args))
            return jnp.sum(final[0].astype(jnp.float32))

        return jax.jit(fn)

    f_lo, f_hi = runner(LO), runner(HI)
    float(f_lo(*inputs)); float(f_hi(*inputs))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f_lo(*inputs)); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f_hi(*inputs)); t_hi = time.perf_counter() - t0
        ts.append((t_hi - t_lo) / (HI - LO))
    return float(np.median(ts))


intr = default_kinect_intrinsics(W, H)
color_np, noisy_np, gt_np = make_noisy_scene(H, W, intr, seed=0)

pts = projective_to_real(jnp.asarray(noisy_np), intr) / 1000.0
smooth = normals.smoothing_map(pts, NormalParams())

print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)

n_xla = jax.jit(lambda p, s: normals.cm_normals(p, s, 20, cov_impl="xla"))
n_pal = jax.jit(lambda p, s: normals.cm_normals(p, s, 20, cov_impl="pallas"))

a = np.asarray(jax.block_until_ready(n_xla(pts, smooth)))
b = np.asarray(jax.block_until_ready(n_pal(pts, smooth)))
diff = np.abs(a - b)
print("max abs diff:", float(diff.max()), "bit-exact:", bool((a == b).all()))
print("mismatched px (>1e-5):", int((diff.max(-1) > 1e-5).sum()), "/", a.shape[0] * a.shape[1])

for name in ["xla", "pallas"]:
    ms = chained_time(
        lambda v, impl=name: normals.cm_normals(v, smooth, 20, cov_impl=impl), (pts,)
    )
    print(f"cm_normals[{name}]: {ms*1000:.3f} ms/frame (chained device time)", flush=True)
