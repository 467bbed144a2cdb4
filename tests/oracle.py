"""NumPy loop-level transliterations of the reference CUDA kernels.

These are the accuracy oracles for the JAX ops (SURVEY.md §4): independent,
deliberately naive per-pixel implementations following the cited reference
kernels line by line, with the documented bug-fidelity decisions applied
(see docs in each op module).  Slow: run them on small images only.
"""

from __future__ import annotations

import numpy as np

VALID = 50.0


# ---------------------------------------------------------------- bilateral


def guide_bilateral(color: np.ndarray, window=5, sigma_color=30.0, sigma_space=30.0):
    """cv::gpu::bilateralFilter model: square window, Gaussian space +
    squared-Euclidean colour terms, reflect-101 border, round to u8."""
    h, w, _ = color.shape
    r = window // 2
    cf = color.astype(np.float64)
    out = np.zeros_like(cf)
    for y in range(h):
        for x in range(w):
            num = np.zeros(3)
            den = 0.0
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    yy = y + dy
                    xx = x + dx
                    # reflect-101
                    yy = -yy if yy < 0 else (2 * h - 2 - yy if yy >= h else yy)
                    xx = -xx if xx < 0 else (2 * w - 2 - xx if xx >= w else xx)
                    cdiff = cf[y, x] - cf[yy, xx]
                    wgt = np.exp(
                        -(dy * dy + dx * dx) / (2 * sigma_space**2)
                        - np.dot(cdiff, cdiff) / (2 * sigma_color**2)
                    )
                    num += cf[yy, xx] * wgt
                    den += wgt
            out[y, x] = num / den
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def joint_bilateral_filter(
    depth: np.ndarray,
    guide: np.ndarray,
    window=5,
    spatial_sigma=70.0,
    color_sigma=50.0,
    depth_sigma=20.0,
):
    """joint_bilateral_filtering (JointBilateralFilter.cu:4-83); `guide` is the
    already-smoothed colour image.

    Bug-fidelity decision (matches ops/bilateral.py): the reference's
    `if (term != 0) filter *= term` value-guards are a proxy for "was the term
    computed" (terms are initialised to 0 and only assigned when their sigma
    != 0); the proxy misfires when the f32 Gaussian underflows across large
    depth steps, giving far neighbours full weight.  FIXED: terms multiply
    iff their sigma != 0."""
    h, w = depth.shape
    r = window // 2
    g = guide.astype(np.float64)
    spatial = np.zeros((window, window))
    for i in range(window):
        for j in range(window):
            spatial[i, j] = np.exp(
                -((j - r) ** 2 + (i - r) ** 2) / (2.0 * spatial_sigma**2)
            )
    out = np.zeros_like(depth)
    for y in range(h):
        for x in range(w):
            wavg = 0.0
            wsum = 0.0
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w and depth[yy, xx] > VALID:
                        cd = g[y, x] - g[yy, xx]
                        filt = spatial[dy + r, dx + r]
                        if color_sigma != 0.0:
                            filt *= np.exp(-np.dot(cd, cd) / (2 * color_sigma**2))
                        wavg += depth[yy, xx] * filt
                        wsum += filt
            if wsum <= 0.0:
                out[y, x] = 0.0
                continue
            wavg /= wsum
            num = 0.0
            den = 0.0
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w and depth[yy, xx] > VALID:
                        cd = g[y, x] - g[yy, xx]
                        filt = spatial[dy + r, dx + r]
                        if color_sigma != 0.0:
                            filt *= np.exp(-np.dot(cd, cd) / (2 * color_sigma**2))
                        if depth_sigma != 0.0:
                            filt *= np.exp(
                                -((depth[yy, xx] - wavg) ** 2) / (2 * depth_sigma**2)
                            )
                        num += depth[yy, xx] * filt
                        den += filt
            out[y, x] = 0.0 if den == 0.0 else num / den
    return out


def markov_random_field(
    depth: np.ndarray, color: np.ndarray, window=5, color_sigma=50.0, smooth_sigma=150.0
):
    """markov_random_field (MarkovRandomField.cu:4-40)."""
    h, w = depth.shape
    r = window // 2
    cf = color.astype(np.float64)
    out = np.zeros_like(depth)
    for y in range(h):
        for x in range(w):
            num = float(depth[y, x])
            den = 1.0
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w and depth[yy, xx] > VALID:
                        cd = cf[y, x] - cf[yy, xx]
                        cfil = (
                            np.exp(-color_sigma * np.dot(cd, cd))
                            if color_sigma != 0.0
                            else 0.0
                        )
                        filt = smooth_sigma * cfil
                        num += depth[yy, xx] * filt
                        den += filt
            out[y, x] = 0.0 if den == 0.0 else num / den
    return out


# ------------------------------------------------------------------ camera


def projective_to_real(depth: np.ndarray, fx, fy, cx, cy):
    h, w = depth.shape
    out = np.zeros((h, w, 3), np.float64)
    for y in range(h):
        for x in range(w):
            z = depth[y, x]
            out[y, x, 0] = (x - cx) / fx * z
            out[y, x, 1] = (cy - y) / fy * z
            out[y, x, 2] = z
    return out
