"""Which merged clusters carry the opt_var damage on the real frame?"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from kinectdepthmapenhancement_tpu.core.camera import (
    default_kinect_intrinsics, normalized_rays, projective_to_real,
)
from kinectdepthmapenhancement_tpu.core.config import KDEConfig
from kinectdepthmapenhancement_tpu.core.io import imread_rgb
from kinectdepthmapenhancement_tpu.ops import bilateral, ccl, normals, plane, slic

color_np = imread_rgb("/root/reference/input/color.jpg")
h, w = color_np.shape[:2]
intr = default_kinect_intrinsics(w, h)
lum = np.asarray(color_np, np.float32).mean(-1)
k9 = np.ones((9, 9), np.float32) / 81.0
lum_s = np.asarray(jax.scipy.signal.convolve2d(jnp.asarray(lum), jnp.asarray(k9), mode="same"))
bands = np.digitize(lum_s, np.quantile(lum_s, [0.2, 0.4, 0.6, 0.8]))
gt = np.take(np.array([1500.0, 1900.0, 2400.0, 3000.0, 3600.0], np.float32), bands)
rng = np.random.default_rng(11)
variance = 0.45 * 2.85 * np.square(gt / 10.0) / 1.0e4
noisy = (gt + rng.uniform(-1.0, 1.0, gt.shape) * variance).astype(np.float32)
cfg = KDEConfig()

gy, gx = np.gradient(gt)
interior = ~((np.abs(gy) + np.abs(gx)) > 1.0)
for _ in range(3):
    e = interior
    interior = (e & np.roll(e, 1, 0) & np.roll(e, -1, 0)
                & np.roll(e, 1, 1) & np.roll(e, -1, 1))


def stages(depth, color):
    rays = normalized_rays(intr, h, w)
    jbf_depth = bilateral.joint_bilateral_filter(depth, color, cfg.jbf)
    points = projective_to_real(jbf_depth, intr)
    nmap = normals.generate_normal_map(points, cfg.normals)
    nasp = slic.segment(color, points, nmap, grid=cfg.grid, params=cfg.nasp, variant="nasp")
    nasp_cell = slic.cell_index(nasp.labels, cfg.grid, neighborhood=8)
    merged = ccl.merge_normals(
        nasp.labels, nasp.clusters.normal, nasp.clusters.center, cfg.ccl, index=nasp_cell)
    plane_fitted = plane.set_pseudo_depth_map(
        points, rays, merged.nd_map, merged.labels, merged.variance)
    opt_var = plane.variance_optimization(
        points, plane_fitted, merged.labels, merged.variance, merged.sizes,
        min_cluster_size=cfg.min_cluster_size,
        agree_tight=cfg.agree_tight, agree_loose=cfg.agree_loose)
    final = plane.depth_bilateral(opt_var, rays, cfg.projection)
    return dict(jbf=jbf_depth, zp=plane_fitted[..., 2], opt=opt_var[..., 2],
                final=final[..., 2], ml=merged.labels, var=merged.variance,
                sz=merged.sizes)


out = jax.tree_util.tree_map(np.asarray, jax.jit(stages)(jnp.asarray(noisy), jnp.asarray(color_np)))
jbf, zp, opt, ml = out["jbf"], out["zp"], out["opt"], out["ml"]

err_j = np.abs(jbf - gt)
err_o = np.abs(opt - gt)
sq_j = ((jbf - gt) ** 2)[interior]
sq_o = ((opt - gt) ** 2)[interior]
print(f"interior rmse jbf={np.sqrt(sq_j.mean()):.3f} opt={np.sqrt(sq_o.mean()):.3f}")

# total added squared error, grouped by merged cluster
add = ((opt - gt) ** 2 - (jbf - gt) ** 2)
addm = np.where(interior, add, 0.0)
K = addm.size
labels_flat = ml.ravel()
added_per = np.bincount(np.maximum(labels_flat, 0), weights=addm.ravel(),
                        minlength=ml.max() + 1)
order = np.argsort(-added_per)[:8]
npix_int = interior.sum()
for c in order:
    sel = (ml == c) & interior
    snapped = sel & (opt != jbf)
    if sel.sum() == 0:
        continue
    zp_err = (zp - gt)[sel & (zp != jbf)]
    print(f"cluster {c:6d}: size={out['sz'][c]:6.0f} var={out['var'][c]:.4f} "
          f"added_mse_contrib={added_per[c]/npix_int:9.3f} "
          f"snapped={snapped.sum():6d}/{sel.sum():6d} "
          f"zp-gt mean={zp_err.mean() if zp_err.size else 0:8.1f} "
          f"std={zp_err.std() if zp_err.size else 0:8.1f}")

# distribution of plane offset (zp-gt) over snapped interior pixels
snapped = interior & (opt != jbf)
print(f"\nsnapped interior pixels: {snapped.sum()} ({100*snapped.mean():.1f}%)")
off = (zp - gt)[snapped]
print(f"zp-gt over snapped: mean {off.mean():.2f} rms {np.sqrt((off**2).mean()):.2f} "
      f"p50 {np.median(np.abs(off)):.2f} p95 {np.percentile(np.abs(off),95):.2f}")
opt_off = (opt - gt)[snapped]
print(f"opt-gt over snapped: rms {np.sqrt((opt_off**2).mean()):.2f}")
unsnapped = interior & ~snapped
uo = (opt - gt)[unsnapped]
print(f"opt-gt over unsnapped interior: rms {np.sqrt((uo**2).mean()):.2f}")

# per-cluster relative rms residual of the plane fit vs jbf depth
zj = jbf
proj = zp != zj  # pixels that were plane-projected
validm = (zj > 50.0) & (ml >= 0) & proj
rel2 = np.where(validm, ((zp - zj) / np.maximum(zj, 1.0)) ** 2, 0.0)
K = int(ml.max()) + 1
cnt = np.bincount(np.maximum(ml, 0).ravel(), weights=validm.ravel().astype(np.float64), minlength=K)
s2 = np.bincount(np.maximum(ml, 0).ravel(), weights=rel2.ravel(), minlength=K)
rr = np.sqrt(s2 / np.maximum(cnt, 1.0))
live = cnt > 0
print("\nper-cluster relative rms plane residual (live clusters):")
for c in np.where(live)[0]:
    snapped_c = ((ml == c) & interior & (opt != jbf)).sum()
    print(f"  c={c:4d} n={cnt[c]:7.0f} resid={100*rr[c]:7.3f}% snapped={snapped_c}")
