"""NumPy transliteration of the Projection_GPU KDE path
(Projection_GPU.cu:248-272: setPsuedoDepth + variance_optimization +
bilateralfilter), matching ops/plane.py's documented fidelity decisions
(variance clamped to 1 before the acos gate)."""

from __future__ import annotations

import numpy as np

VALID = 50.0
COS_PI_8 = np.cos(3.141592653 / 8.0)


def normalized_rays(fx, fy, cx, cy, h, w):
    """Unit-z ray map (Projection_GPU.cu:3-19)."""
    out = np.zeros((h, w, 3), np.float64)
    for y in range(h):
        for x in range(w):
            out[y, x] = ((x - cx) / fx, (cy - y) / fy, 1.0)
    return out


def set_pseudo_depth_map(points, rays, nd_map, labels, variance):
    """First setPsuedoDepth overload (Projection_GPU.cu:20-48)."""
    h, w = labels.shape
    out = points.astype(np.float64).copy()
    for y in range(h):
        for x in range(w):
            l = labels[y, x]
            if l <= -1:
                continue
            var = min(variance[l], 1.0)
            if not var > COS_PI_8:
                continue
            a, b, c, d = nd_map[y, x]
            denom = a * rays[y, x, 0] + b * rays[y, x, 1] + c
            if denom == 0.0:
                denom = 1e-30
            z = abs(d / denom)
            out[y, x] = rays[y, x] * z
    return out


def plane_fit_residual(points, plane_fitted, labels, k):
    """Per-cluster relative RMS plane residual (spec extension; mirrors
    ops/plane.py::plane_fit_residual)."""
    z = points[..., 2]
    zp = plane_fitted[..., 2]
    s2 = np.zeros(k, np.float64)
    cnt = np.zeros(k, np.float64)
    h, w = labels.shape
    for y in range(h):
        for x in range(w):
            l = labels[y, x]
            if l < 0 or z[y, x] <= VALID:
                continue
            s2[l] += ((zp[y, x] - z[y, x]) / max(z[y, x], 1.0)) ** 2
            cnt[l] += 1.0
    return np.sqrt(s2 / np.maximum(cnt, 1.0))


def variance_optimization(
    optimized,
    plane_fitted,
    labels,
    variance,
    sizes,
    min_cluster_size=1300,
    agree_tight=0.01,
    agree_loose=0.03,
    fit_residual=None,
    max_fit_residual=0.0,
):
    """variance_optimization (Projection_GPU.cu:174-196): snap/blend z toward
    the plane for big coherent clusters; only z changes.  fit_residual /
    max_fit_residual: the plane-confidence gate (spec extension, see
    ops/plane.py)."""
    h, w = labels.shape
    out = optimized.astype(np.float64).copy()
    for y in range(h):
        for x in range(w):
            zo = optimized[y, x, 2]
            zp = plane_fitted[y, x, 2]
            l = labels[y, x]
            if l <= -1 or zp <= VALID:
                continue
            var = min(variance[l], 1.0)
            if not (var > COS_PI_8 and sizes[l] > min_cluster_size):
                continue
            if fit_residual is not None and not (
                fit_residual[l] < max_fit_residual
            ):
                continue
            diff = abs(zo - zp)
            if diff < zo * agree_tight:
                out[y, x, 2] = zp
            elif diff < zo * agree_loose:
                out[y, x, 2] = zp * var + zo * (1.0 - var)
    return out


def depth_bilateral(optimized, rays, window=7, spatial_sigma=20.0, depth_sigma=100.0):
    """bilateralfilter (Projection_GPU.cu:198-227)."""
    h, w = optimized.shape[:2]
    r = window // 2
    z = optimized[..., 2]
    out = np.zeros_like(optimized, np.float64)
    for y in range(h):
        for x in range(w):
            num = 0.0
            den = 0.0
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w and z[yy, xx] > VALID:
                        sfil = np.exp(
                            -(dy * dy + dx * dx) / (2.0 * spatial_sigma**2)
                        )
                        dfil = np.exp(
                            -((z[yy, xx] - z[y, x]) ** 2) / (2.0 * depth_sigma**2)
                        )
                        num += z[yy, xx] * sfil * dfil
                        den += sfil * dfil
            nz = 0.0 if den == 0.0 else num / den
            out[y, x] = rays[y, x] * nz
    return out
