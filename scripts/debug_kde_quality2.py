"""Part 2: JBF underflow-guard impact + merged-plane accuracy decomposition."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from kinectdepthmapenhancement_tpu.core.camera import (
    default_kinect_intrinsics,
    normalized_rays,
    projective_to_real,
)
from kinectdepthmapenhancement_tpu.core.config import KDEConfig
from kinectdepthmapenhancement_tpu.core.testdata import make_noisy_scene
from kinectdepthmapenhancement_tpu.ops import bilateral, ccl, normals, slic, stencil
from kinectdepthmapenhancement_tpu.core.buffer2d import VALID_DEPTH_MM

H, W = 480, 640
intr = default_kinect_intrinsics(W, H)
color_np, noisy_np, gt_np = make_noisy_scene(H, W, intr, seed=0)
cfg = KDEConfig()

color = jnp.asarray(color_np)
noisy = jnp.asarray(noisy_np)
gtn = gt_np
valid_gt = (gtn > 50.0) & (gtn < 15000.0)


def rmse(d, mask_extra=None):
    m = (d > 50.0) & (d < 15000.0) & valid_gt
    if mask_extra is not None:
        m = m & mask_extra
    return float(np.sqrt(np.mean(np.square(d[m] - gtn[m])))), int(m.sum())


# --- JBF variant without the underflow guard (term multiplies even when 0)
def jbf_noguard(depth, color, p):
    guide = bilateral.guide_bilateral(color, p).astype(jnp.float32)
    h, w = depth.shape
    r = p.window // 2
    spatial = stencil.gaussian_spatial_filter(p.window, p.spatial_sigma)
    dpad = stencil.pad2d(depth, r, 0.0)
    gpad = stencil.pad2d(guide, r, 0.0)

    def color_filter(nb_guide):
        return jnp.exp(-bilateral._color_dist2(guide, nb_guide) / (2.0 * p.color_sigma**2))

    wsum = jnp.zeros((h, w), jnp.float32)
    dsum = jnp.zeros((h, w), jnp.float32)
    for dy, dx in stencil.offsets(p.window):
        nd = stencil.shift(dpad, dy, dx, r, (h, w))
        ng = stencil.shift(gpad, dy, dx, r, (h, w))
        valid = nd > VALID_DEPTH_MM
        filt = spatial[dy + r, dx + r] * color_filter(ng)
        filt = jnp.where(valid, filt, 0.0)
        dsum = dsum + nd * filt
        wsum = wsum + filt
    mean = dsum / jnp.where(wsum > 0.0, wsum, 1.0)

    num = jnp.zeros((h, w), jnp.float32)
    den = jnp.zeros((h, w), jnp.float32)
    for dy, dx in stencil.offsets(p.window):
        nd = stencil.shift(dpad, dy, dx, r, (h, w))
        ng = stencil.shift(gpad, dy, dx, r, (h, w))
        valid = nd > VALID_DEPTH_MM
        filt = spatial[dy + r, dx + r] * color_filter(ng)
        filt = filt * jnp.exp(-jnp.square(nd - mean) / (2.0 * p.depth_sigma**2))
        filt = jnp.where(valid, filt, 0.0)
        num = num + nd * filt
        den = den + filt
    out = jnp.where(den != 0.0, num / jnp.where(den != 0.0, den, 1.0), 0.0)
    return jnp.where(wsum > 0.0, out, 0.0)


jbf_ref = np.asarray(jax.jit(
    lambda d, c: bilateral.joint_bilateral_filter(d, c, cfg.jbf))(noisy, color))
jbf_ng = np.asarray(jax.jit(lambda d, c: jbf_noguard(d, c, cfg.jbf))(noisy, color))

print("JBF (reference quirk) rmse: %.3f (n=%d)" % rmse(jbf_ref))
print("JBF (no guard)        rmse: %.3f (n=%d)" % rmse(jbf_ng))

# region split for both
regions = {
    "wall": (gtn >= 2990) & (gtn <= 3010),
    "box1800": (gtn >= 1790) & (gtn <= 1810),
    "other": (gtn > 50) & ~(((gtn >= 2990) & (gtn <= 3010)) | ((gtn >= 1790) & (gtn <= 1810))),
}
for name, reg in regions.items():
    r1, n1 = rmse(jbf_ref, reg)
    r2, _ = rmse(jbf_ng, reg)
    r0, _ = rmse(noisy_np, reg)
    print(f"  {name:8s}: input {r0:7.3f}  quirk {r1:7.3f}  noguard {r2:7.3f}  n={n1}")

# --- plane decomposition: recompute pipeline up to merge, inspect wall plane
def upto_merge(depth, color):
    jbf_depth = bilateral.joint_bilateral_filter(depth, color, cfg.jbf)
    points = projective_to_real(jbf_depth, intr)
    nmap = normals.generate_normal_map(points, cfg.normals)
    nasp = slic.segment(color, points, nmap, grid=cfg.grid, params=cfg.nasp, variant="nasp")
    nasp_cell = slic.cell_index(nasp.labels, cfg.grid, neighborhood=8)
    merged = ccl.merge_normals(
        nasp.labels, nasp.clusters.normal, nasp.clusters.center, cfg.ccl,
        index=nasp_cell)
    return merged.labels, merged.cluster_nd, merged.sizes, nasp.labels, nasp.clusters.normal, nasp.clusters.center

mlab, cnd, msz, nasp_lab, sp_n, sp_c = [np.asarray(x) for x in jax.jit(upto_merge)(noisy, color)]

# which merged label dominates the wall?
wall = (gtn >= 2990) & (gtn <= 3010)
ids, cts = np.unique(mlab[wall], return_counts=True)
top = ids[np.argsort(-cts)][:4]
print("\nwall merged-label histogram:", list(zip(top.tolist(), np.sort(cts)[::-1][:4].tolist())))
for t in top[:2]:
    if t < 0: continue
    nd = cnd[t]
    n = nd[:3] / np.linalg.norm(nd[:3])
    print(f"  rep {t}: n={n.round(5)} d={nd[3]:.2f} |n_raw|={np.linalg.norm(nd[:3]):.4f} "
          f"-> plane depth at center ray: {nd[3]/np.linalg.norm(nd[:3]):.2f} size={msz[t]}")

# per-superpixel normals of wall superpixels: how tilted?
# wall superpixels = NASP clusters whose pixels are mostly wall
k = cfg.grid.num_clusters
wall_frac = np.zeros(k)
for c in range(k):
    mask = nasp_lab == c
    tot = mask.sum()
    if tot:
        wall_frac[c] = (mask & wall).sum() / tot
pure = np.where(wall_frac > 0.95)[0]
if len(pure):
    nn = sp_n[pure]
    nn = nn / np.maximum(np.linalg.norm(nn, axis=1, keepdims=True), 1e-9)
    ang = np.degrees(np.arccos(np.clip(np.abs(nn[:, 2]), 0, 1)))
    print(f"\npure wall superpixels: {len(pure)}, normal tilt deg: "
          f"mean {ang.mean():.3f} p90 {np.percentile(ang,90):.3f} max {ang.max():.3f}")
    # d of each: n . center
    d_sp = np.abs(np.sum(nn * sp_c[pure], axis=1))
    print(f"  per-sp plane depth |n.c|: mean {d_sp.mean():.2f} std {d_sp.std():.2f} (true 3000)")
