"""Diagnose which KDE stage carries the residual depth error at 640x480.

Replicates kde_pipeline stage by stage and prints depth RMSE vs ground truth
after each stage, plus gate statistics (merged sizes / variance distributions)
so we can see whether variance_optimization actually fires.
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
from kinectdepthmapenhancement_tpu.core.testdata import make_noisy_scene
from kinectdepthmapenhancement_tpu.ops import bilateral, ccl, normals, plane, slic
from kinectdepthmapenhancement_tpu.utils import metrics

H, W = 480, 640
intr = default_kinect_intrinsics(W, H)
color_np, noisy_np, gt_np = make_noisy_scene(H, W, intr, seed=0)
cfg = KDEConfig()

color = jnp.asarray(color_np)
noisy = jnp.asarray(noisy_np)
gt = jnp.asarray(gt_np)


def stages(depth, color):
    h, w = depth.shape
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
        plane_gate_proj=plane_fitted[..., 2] != points[..., 2],
    )


out = jax.jit(stages)(noisy, color)
out = jax.tree_util.tree_map(np.asarray, out)

gtn = np.asarray(gt)
valid_gt = (gtn > 50.0) & (gtn < 15000.0)


def rmse(d, mask_extra=None):
    m = (d > 50.0) & (d < 15000.0) & valid_gt
    if mask_extra is not None:
        m = m & mask_extra
    return float(np.sqrt(np.mean(np.square(d[m] - gtn[m])))), int(m.sum())


print("input  rmse: %.3f mm (n=%d)" % rmse(noisy_np))
for k in ["jbf", "plane_fitted", "opt_var", "final"]:
    r, n = rmse(out[k])
    print(f"{k:13s} rmse: {r:8.3f} mm (n={n})")

# where did the error concentrate? split final-stage error by GT region
final = out["final"]
m = (final > 50.0) & (final < 15000.0) & valid_gt
err = np.abs(final - gtn)
for name, lo, hi in [("wall3000", 2990, 3010), ("box1800", 1790, 1810),
                     ("floor", 400, 2990), ("slant", 1000, 2900)]:
    sel = m & (gtn >= lo) & (gtn < hi)
    if sel.sum():
        print(f"  region {name:9s}: rmse {np.sqrt(np.mean(err[sel]**2)):8.3f} "
              f"p99 {np.percentile(err[sel], 99):8.1f} n={sel.sum()}")

# error by stage-transition: which pixels got WORSE in the final bilateral
worse = m & (np.abs(out['opt_var'] - gtn) + 1.0 < err)
print(f"pixels made >1mm worse by depth_bilateral: {worse.sum()} "
      f"({100.0 * worse.mean():.2f}%), their rmse after: "
      f"{np.sqrt(np.mean(err[worse]**2)) if worse.sum() else 0:.2f}")
worse_v = m & (np.abs(out['plane_fitted'] - gtn) + 1.0 < np.abs(out['opt_var'] - gtn))
print(f"pixels made >1mm worse by variance_opt: {worse_v.sum()}")
worse_p = m & (np.abs(out['jbf'] - gtn) + 1.0 < np.abs(out['plane_fitted'] - gtn))
print(f"pixels made >1mm worse by plane_fit: {worse_p.sum()}")

# gate statistics
sizes = out["merged_sizes"]
var = out["merged_variance"]
live = sizes > 0
print(f"\nmerged clusters: {live.sum()} live; sizes p50={np.median(sizes[live]):.0f} "
      f"max={sizes.max()}; > {cfg.min_cluster_size}px: {(sizes > cfg.min_cluster_size).sum()}")
import math
COS = math.cos(math.pi / 8)
print(f"variance>cos(pi/8): {((np.minimum(var,1.0) > COS) & live).sum()} of {live.sum()}")
print(f"plane-projected pixels: {out['plane_gate_proj'].mean()*100:.1f}%")

# normals quality on the wall
nm = out["normals"]
wall = (gtn >= 2990) & (gtn <= 3010)
nw = nm[wall]
ok = np.any(nw != -1.0, axis=-1)
if ok.sum():
    cosang = np.abs(nw[ok] @ np.array([0.0, 0.0, 1.0]))
    print(f"\nwall normals: mean |cos| to true normal = {cosang.mean():.5f}, "
          f"mean angle = {np.degrees(np.arccos(np.clip(cosang,0,1))).mean():.3f} deg")
