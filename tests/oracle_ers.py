"""NumPy loop transliteration of EdgeRefinedSuperpixel under the
deterministic spec documented in ops/ers.py (pre-pass reads, nearest-boundary
wins, ties to left/up, zeroing by winning command only)."""

from __future__ import annotations

import numpy as np

VALID = 50.0


def _row_pass(color_labels, labels, depth, half):
    h, w = labels.shape
    new_labels = labels.copy()
    new_depth = depth.copy()
    # per-boundary first hit
    cmds = []  # (y, x_boundary, side, d)
    for y in range(h):
        for x in range(w):
            if x + 1 >= w or labels[y, x] == labels[y, x + 1]:
                continue
            c0 = color_labels[y, x]
            hit = None
            for d in range(1, half + 1):
                if x - d >= 0 and color_labels[y, x - d] != c0:
                    hit = ("left", d)
                    break
                if x + d < w and color_labels[y, x + d] != c0:
                    hit = ("right", d)
                    break
            if hit:
                cmds.append((y, x, hit[0], hit[1]))

    # resolve per pixel: nearest boundary, ties to smaller x_boundary...
    # priority: j=0 left@q, then for j=1..: right@q-j before left@q+j
    cover = {}
    for (y, xb, side, d) in cmds:
        if side == "left":
            rng = range(xb - d + 1, xb + 1)
        else:
            rng = range(xb + 1, xb + d)
        for q in rng:
            j = abs(xb - q)
            key = (y, q)
            prio = (j, 0 if xb <= q else 1)
            if key not in cover or prio < cover[key][0]:
                cover[key] = (prio, xb, side)
    for (y, q), (_, xb, side) in cover.items():
        if side == "left":
            new_labels[y, q] = labels[y, xb + 1]
            nb = depth[y, q + 1] if q + 1 < w else 0.0
            if abs(depth[y, q] - nb) > depth[y, q] * 0.1:
                new_depth[y, q] = 0.0
        else:
            new_labels[y, q] = labels[y, xb]
            nb = depth[y, q - 1] if q - 1 >= 0 else 0.0
            if abs(depth[y, q] - nb) > depth[y, q] * 0.1:
                new_depth[y, q] = 0.0
    return new_labels, new_depth


def edge_refine(color_labels, depth_labels, depth, window=7):
    half = window // 2
    l1, d1 = _row_pass(color_labels, depth_labels, depth, half)
    l2, d2 = _row_pass(color_labels.T, l1.T, d1.T, half)
    return l2.T, d2.T


def depth_enhance(depth, labels, color, window=7, ss=30.0, sc=50.0, sd=70.0):
    h, w = depth.shape
    r = window // 2
    cf = color.astype(np.float64)
    spatial = np.zeros((window, window))
    for i in range(window):
        for j in range(window):
            spatial[i, j] = np.exp(-((j - r) ** 2 + (i - r) ** 2) / (2 * ss**2))
    out = np.zeros_like(depth, np.float64)
    for y in range(h):
        for x in range(w):
            wavg = 0.0
            wsum = 0.0
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    yy, xx = y + dy, x + dx
                    if (
                        0 <= yy < h and 0 <= xx < w
                        and depth[yy, xx] > VALID
                        and labels[y, x] == labels[yy, xx]
                    ):
                        cd = cf[y, x] - cf[yy, xx]
                        # sigma-gated terms (fixed value-guard quirk, see
                        # tests/oracle.py::joint_bilateral_filter)
                        filt = spatial[dy + r, dx + r]
                        if sc:
                            filt *= np.exp(-np.dot(cd, cd) / (2 * sc**2))
                        wavg += depth[yy, xx] * filt
                        wsum += filt
            if wsum <= 0.0:
                out[y, x] = 0.0
                continue
            wavg /= wsum
            cnt = 0
            dev = 0.0
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    yy, xx = y + dy, x + dx
                    if (
                        0 <= yy < h and 0 <= xx < w
                        and depth[yy, xx] > VALID
                        and labels[y, x] == labels[yy, xx]
                    ):
                        dev += abs(depth[yy, xx] - wavg)
                        cnt += 1
            if cnt:
                dev /= cnt
            num = 0.0
            den = 0.0
            # adaptive sigma computed ONCE per pixel (fixed recurrence bug,
            # see ops/ers.py pass-3 notes): sigma = max(adaptive, 0.3*sigma_0)
            adaptive = np.float32(5.0) * np.float32(dev) / np.float32(
                wavg * wavg if wavg != 0.0 else 1.0
            )
            sigma = max(adaptive, np.float32(sc) * np.float32(0.3))
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w and depth[yy, xx] > VALID:
                        filt = spatial[dy + r, dx + r]
                        # sigma-gated terms (fixed value-guard quirk)
                        if sc:
                            cd = cf[y, x] - cf[yy, xx]
                            filt *= np.exp(
                                -np.dot(cd, cd) / (2 * max(sigma, 1e-30) ** 2)
                            )
                        if sd:
                            filt *= np.exp(
                                -((depth[yy, xx] - wavg) ** 2) / (2 * sd**2)
                            )
                        num += depth[yy, xx] * filt
                        den += filt
            out[y, x] = 0.0 if den == 0.0 else num / den
    return out
