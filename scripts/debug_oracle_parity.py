"""One-shot diagnostic for the composed KDE oracle parity test: computes the
oracle + device pipelines at 96x128, saves both to /tmp/oracle_parity.npz,
and prints where/why normals and final outputs disagree."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import dataclasses

import numpy as np
import jax.numpy as jnp

import oracle_pipeline
from kinectdepthmapenhancement_tpu.core.camera import default_kinect_intrinsics
from kinectdepthmapenhancement_tpu.core.config import GridParams, KDEConfig
from kinectdepthmapenhancement_tpu.core.testdata import make_noisy_scene
from kinectdepthmapenhancement_tpu.models import pipelines

h, w = 96, 128
intr = default_kinect_intrinsics(w, h)
color, noisy, gt = make_noisy_scene(h, w, intr, seed=0)
grid = GridParams(rows=3, cols=4)
cfg = dataclasses.replace(KDEConfig(), grid=grid)

cache = "/tmp/oracle_parity.npz"
if os.path.exists(cache):
    z = np.load(cache, allow_pickle=True)
    want = {k: z[k] for k in z.files}
    print("loaded cached oracle")
else:
    want = oracle_pipeline.kde_oracle(
        noisy.astype(np.float64), color, intr.fx, intr.fy, intr.cx, intr.cy,
        rows=grid.rows, cols=grid.cols,
    )
    np.savez(cache, **want)
    print("oracle computed + cached")

res = jax.jit(lambda d, c: pipelines.kde_pipeline(d, c, intr, cfg))(
    jnp.asarray(noisy), jnp.asarray(color)
)

got_n = np.asarray(res.normals)
wn = want["normals"]
gv = (got_n != -1.0).any(-1)
wv = (wn != -1.0).any(-1)
both = gv & wv
dots = np.abs(np.sum(got_n * wn, axis=-1))
bad = both & (dots <= 0.9)
print(f"valid flags match: {(gv == wv).mean():.4f}")
print(f"both-valid: {both.sum()}, bad(dot<=0.9): {bad.sum()} ({bad.mean()*100:.2f}%)")
ys, xs = np.nonzero(bad)
print("bad pixel rows: min/max", ys.min() if len(ys) else "-", ys.max() if len(ys) else "-")
print("bad pixel cols: min/max", xs.min() if len(xs) else "-", xs.max() if len(xs) else "-")
border = 20
inb = (xs <= border) | (xs >= w - border) | (ys <= border) | (ys >= h - border)
print(f"bad within border-20 ring: {inb.mean()*100:.1f}%")
for i in range(0, min(len(ys), 10)):
    y, x = ys[i], xs[i]
    print(f"  ({y},{x}) got={got_n[y,x]} want={wn[y,x]} dot={dots[y,x]:.4f}")
# norms of each
gn = np.linalg.norm(got_n, axis=-1)
wn_n = np.linalg.norm(wn, axis=-1)
print("zero-norm got:", int((both & (gn < 1e-6)).sum()), "zero-norm want:", int((both & (wn_n < 1e-6)).sum()))

# final output
got_p = np.asarray(res.optimized_points)
diff = np.abs(got_p - want["optimized_points"]).max(-1)
print(f"final: frac<1mm={(diff < 1.0).mean():.4f}  p99.9={np.quantile(diff, 0.999):.2f}  max={diff.max():.2f}")
lab_eq = (np.asarray(res.nasp_labels) == want["nasp_labels"]).mean()
print(f"nasp label agreement: {lab_eq:.4f}")
