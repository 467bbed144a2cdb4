"""Per-cluster plane residual on the SYNTHETIC scene (make_noisy_scene) to
validate the plane-confidence threshold keeps snapping alive there."""

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
from kinectdepthmapenhancement_tpu.core.testdata import make_noisy_scene
from kinectdepthmapenhancement_tpu.ops import bilateral, ccl, normals, plane, slic

H, W = 480, 640
intr = default_kinect_intrinsics(W, H)
color_np, noisy_np, gt_np = make_noisy_scene(H, W, intr, seed=0)
cfg = KDEConfig()


def stages(depth, color):
    rays = normalized_rays(intr, H, W)
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
    return dict(jbf=jbf_depth, zp=plane_fitted[..., 2], opt=opt_var[..., 2],
                ml=merged.labels, sz=merged.sizes)


out = jax.tree_util.tree_map(np.asarray, jax.jit(stages)(jnp.asarray(noisy_np), jnp.asarray(color_np)))
jbf, zp, opt, ml = out["jbf"], out["zp"], out["opt"], out["ml"]
gtn = gt_np

validm = (jbf > 50.0) & (ml >= 0) & (zp != jbf)
rel2 = np.where(validm, ((zp - jbf) / np.maximum(jbf, 1.0)) ** 2, 0.0)
K = int(ml.max()) + 1
cnt = np.bincount(np.maximum(ml, 0).ravel(), weights=validm.ravel().astype(np.float64), minlength=K)
s2 = np.bincount(np.maximum(ml, 0).ravel(), weights=rel2.ravel(), minlength=K)
rr = np.sqrt(s2 / np.maximum(cnt, 1.0))
print("synthetic per-cluster relative rms plane residual:")
for c in np.where(cnt > 0)[0]:
    snapped_c = ((ml == c) & (opt != jbf)).sum()
    big = out["sz"][c] > cfg.min_cluster_size
    print(f"  c={c:4d} n={cnt[c]:7.0f} resid={100*rr[c]:7.3f}% snapped={snapped_c} "
          f"size={out['sz'][c]} big={big}")

valid = (gtn > 50) & (gtn < 15000)
print(f"rmse jbf={np.sqrt(np.mean((jbf-gtn)[valid]**2)):.3f} "
      f"opt={np.sqrt(np.mean((opt-gtn)[valid]**2)):.3f}")
