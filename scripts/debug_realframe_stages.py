"""Stage-by-stage interior RMSE on the real-frame fixture of
tests/test_oracle_pipeline.py::test_kde_on_reference_frame.

Prints input / jbf / plane_fitted / opt_var / final interior RMSE, the
gate statistics, and which stage makes pixels worse — on REAL image
statistics (color.jpg + luminance-quantile piecewise GT).
"""

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
    default_kinect_intrinsics,
    normalized_rays,
    projective_to_real,
)
from kinectdepthmapenhancement_tpu.core.config import KDEConfig
from kinectdepthmapenhancement_tpu.core.io import imread_rgb
from kinectdepthmapenhancement_tpu.ops import bilateral, ccl, normals, plane, slic

REF_COLOR = "/root/reference/input/color.jpg"

color_np = imread_rgb(REF_COLOR)
h, w = color_np.shape[:2]
intr = default_kinect_intrinsics(w, h)
lum = np.asarray(color_np, np.float32).mean(-1)
k = np.ones((9, 9), np.float32) / 81.0
lum_s = np.asarray(
    jax.scipy.signal.convolve2d(jnp.asarray(lum), jnp.asarray(k), mode="same")
)
bands = np.digitize(lum_s, np.quantile(lum_s, [0.2, 0.4, 0.6, 0.8]))
gt = np.take(np.array([1500.0, 1900.0, 2400.0, 3000.0, 3600.0], np.float32), bands)
rng = np.random.default_rng(11)
variance = 0.45 * 2.85 * np.square(gt / 10.0) / 1.0e4
noisy = (gt + rng.uniform(-1.0, 1.0, gt.shape) * variance).astype(np.float32)
cfg = KDEConfig()

gy, gx = np.gradient(gt)
edge = (np.abs(gy) + np.abs(gx)) > 1.0
interior = ~edge
for _ in range(3):
    e = interior
    interior = (
        e
        & np.roll(e, 1, 0) & np.roll(e, -1, 0)
        & np.roll(e, 1, 1) & np.roll(e, -1, 1)
    )


def stages(depth, color):
    rays = normalized_rays(intr, h, w)
    jbf_depth = bilateral.joint_bilateral_filter(depth, color, cfg.jbf)
    points = projective_to_real(jbf_depth, intr)
    nmap = normals.generate_normal_map(points, cfg.normals)
    nasp = slic.segment(color, points, nmap, grid=cfg.grid, params=cfg.nasp, variant="nasp")
    nasp_cell = (
        slic.cell_index(nasp.labels, cfg.grid, neighborhood=8)
        if cfg.nasp.iterations == 1
        else None
    )
    merged = ccl.merge_normals(
        nasp.labels, nasp.clusters.normal, nasp.clusters.center, cfg.ccl,
        index=nasp_cell,
    )
    plane_fitted = plane.set_pseudo_depth_map(
        points, rays, merged.nd_map, merged.labels, merged.variance
    )
    opt_var = plane.variance_optimization(
        points, plane_fitted, merged.labels, merged.variance, merged.sizes,
        min_cluster_size=cfg.min_cluster_size,
        agree_tight=cfg.agree_tight,
        agree_loose=cfg.agree_loose,
    )
    final = plane.depth_bilateral(opt_var, rays, cfg.projection)
    return dict(
        jbf=jbf_depth,
        plane_fitted=plane_fitted[..., 2],
        opt_var=opt_var[..., 2],
        final=final[..., 2],
        merged_labels=merged.labels,
        merged_variance=merged.variance,
        merged_sizes=merged.sizes,
        normals=nmap,
        nasp_labels=nasp.labels,
        proj_gate=plane_fitted[..., 2] != points[..., 2],
    )


out = jax.tree_util.tree_map(np.asarray, jax.jit(stages)(jnp.asarray(noisy), jnp.asarray(color_np)))


def rmse(d):
    return float(np.sqrt(np.mean(np.square((d - gt)[interior]))))


print(f"interior frac: {interior.mean():.3f}")
print(f"input        rmse: {rmse(noisy):8.3f}")
for kk in ["jbf", "plane_fitted", "opt_var", "final"]:
    print(f"{kk:13s} rmse: {rmse(out[kk]):8.3f}")

# which stage makes pixels worse (interior)
err = {kk: np.abs(out[kk] - gt) for kk in ["jbf", "plane_fitted", "opt_var", "final"]}
err["input"] = np.abs(noisy - gt)
for a, b in [("input", "jbf"), ("jbf", "plane_fitted"), ("plane_fitted", "opt_var"),
             ("opt_var", "final")]:
    worse = interior & (err[a] + 1.0 < err[b])
    print(f"pixels made >1mm worse by {b:13s}: {worse.sum():7d} ({100*worse.mean():5.2f}%) "
          f"their rmse: {np.sqrt(np.mean((out[b]-gt)[worse]**2)) if worse.sum() else 0:8.2f}")

import math
COS = math.cos(math.pi / 8)
sizes, var = out["merged_sizes"], out["merged_variance"]
live = sizes > 0
print(f"\nmerged clusters: {live.sum()} live; sizes p50={np.median(sizes[live]):.0f} "
      f"max={sizes.max()}; >{cfg.min_cluster_size}px: {(sizes > cfg.min_cluster_size).sum()}")
print(f"variance>cos(pi/8): {((np.minimum(var, 1.0) > COS) & live).sum()} of {live.sum()}")
print(f"plane-projected pixels: {out['proj_gate'].mean()*100:.1f}%")

# normals quality in interior (true normal = +z, fronto-parallel planes)
nm = out["normals"]
ok = interior & np.any(nm != -1.0, axis=-1)
cosang = np.abs(nm[ok] @ np.array([0.0, 0.0, 1.0]))
print(f"interior normals: mean |cos| = {cosang.mean():.5f}, "
      f"p10 = {np.percentile(cosang, 10):.5f}")
