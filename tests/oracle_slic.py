"""NumPy loop transliteration of the SLIC family (SP/DASP/NASP).

Follows the reference kernels with the same documented bug decisions as
kinectdepthmapenhancement_tpu/ops/slic.py (bugs a, b, d fixed; dead
reprojection branch (c) replicated as always-2D-centroid / analyze special
cases).  Deliberately written as independent per-pixel loops.
"""

from __future__ import annotations

import numpy as np

VALID = 50.0


def _nvalid_or(n):
    return (n[0] != -1.0) or (n[1] != -1.0) or (n[2] != -1.0)


def _nvalid_and(n):
    return (n[0] != -1.0) and (n[1] != -1.0) and (n[2] != -1.0)


def _gradient(color_f, normals, variant):
    h, w, _ = color_f.shape
    grad = np.zeros((h, w))
    for y in range(h):
        for x in range(w):
            s = 0.0
            cnt = 0
            for dy in range(-5, 6):
                for dx in range(-5, 6):
                    yy = min(max(y + dy, 0), h - 1)
                    xx = min(max(x + dx, 0), w - 1)
                    d = color_f[y, x] - color_f[yy, xx]
                    g = np.sqrt(np.dot(d, d))
                    if variant == "nasp":
                        if _nvalid_and(normals[y, x]) and _nvalid_and(normals[yy, xx]):
                            nd = abs(float(np.dot(normals[y, x], normals[yy, xx])))
                            g = g * (1.0 - nd)
                    if g > 0.0:
                        cnt += 1
                    s += g
            grad[y, x] = s / cnt if cnt > 0 else np.inf
    return grad


def _seeds(grad, rows, cols, h, w, window):
    ws_x, ws_y = w // cols, h // rows
    r = window // 2
    seeds = np.zeros((rows * cols, 2), np.int64)
    for by in range(rows):
        for bx in range(cols):
            cx0, cy0 = bx * ws_x + ws_x // 2, by * ws_y + ws_y // 2
            best = np.inf
            bxy = (cx0, cy0)
            for oy in range(window):
                for ox in range(window):
                    yy = min(max(cy0 + oy - r, 0), h - 1)
                    xx = min(max(cx0 + ox - r, 0), w - 1)
                    if grad[yy, xx] < best:
                        best = grad[yy, xx]
                        bxy = (xx, yy)
            seeds[by * cols + bx] = bxy
    return seeds


def slic_segment(color, points, normals, rows, cols, sc, ss, sd, sn, iters, variant):
    h, w, _ = color.shape
    k = rows * cols
    ws_x, ws_y = w // cols, h // rows
    s_scale = (ws_x + ws_y) / 2.0
    color_f = color.astype(np.float64)

    if variant == "sp":
        seed_window, nbh = 16, 4
        rp = ws_x * 4 // 16 + 1
    elif variant == "dasp":
        seed_window, nbh = 4, 4
        rp = ws_x * 2 // 16 + 1
    else:
        seed_window, nbh = 8, 8
        rp = ws_x * 2 // 16 + 1
    wlo, whi = -8 * rp, 8 * rp - 1

    grad = _gradient(color_f, normals, variant)
    seeds = _seeds(grad, rows, cols, h, w, seed_window)

    c_rgb = color_f[seeds[:, 1], seeds[:, 0]].copy()
    c_xy = seeds.astype(np.int64).copy()
    c_size = np.zeros(k)
    c_center = (
        points[seeds[:, 1], seeds[:, 0]].astype(np.float64).copy()
        if points is not None
        else np.zeros((k, 3))
    )
    c_normal = (
        normals[seeds[:, 1], seeds[:, 0]].astype(np.float64).copy()
        if normals is not None
        else np.full((k, 3), -1.0)
    )
    c_var = np.zeros(k)

    labels = np.zeros((h, w), np.int64)
    for y in range(h):
        for x in range(w):
            labels[y, x] = (y // ws_y) * cols + (x // ws_x)
    dist = np.full((h, w), 999999.9)

    z = points[..., 2] if points is not None else None

    for _ in range(iters):
        # ---- assignment
        new_labels = labels.copy()
        new_dist = dist.copy()
        r = nbh // 2
        for y in range(h):
            for x in range(w):
                l = max(labels[y, x], 0)
                ccx, ccy = l % cols, l // cols
                best_d, best_l = np.inf, -1
                for oy in range(-r, r):
                    for ox in range(-r, r):
                        rcx, rcy = ccx + ox, ccy + oy
                        if 0 <= rcx < cols and 0 <= rcy < rows:
                            rid = rcy * cols + rcx
                            cd = float(
                                np.dot(
                                    color_f[y, x] - c_rgb[rid],
                                    color_f[y, x] - c_rgb[rid],
                                )
                            )
                            pd = np.sqrt(
                                (x - c_xy[rid, 0]) ** 2 + (y - c_xy[rid, 1]) ** 2
                            ) * (s_scale**2)
                            if variant == "sp":
                                d = cd * sc / (ss + sc) + pd * ss / (ss + sc)
                            else:
                                total = ss + sc + sd + (sn if variant == "nasp" else 0)
                                dd = 0.0
                                if z[y, x] > VALID and c_center[rid, 2] > VALID:
                                    dd = abs(z[y, x] - c_center[rid, 2])
                                d = (
                                    cd * (sc / total) ** 2
                                    + pd * (ss / total) ** 2
                                    + dd * (sd / total) ** 2
                                )
                                if variant == "nasp":
                                    nd = 0.0
                                    if (
                                        z[y, x] > VALID
                                        and c_center[rid, 2] > VALID
                                        and _nvalid_or(normals[y, x])
                                        and _nvalid_or(c_normal[rid])
                                    ):
                                        dot = float(
                                            np.dot(normals[y, x], c_normal[rid])
                                        )
                                        nd = 255.0**2 * (1.0 - max(dot, 0.0))
                                    d += nd * (sn / total) ** 2
                            cand_d, cand_l = d, rid
                        else:
                            cand_d, cand_l = dist[y, x], labels[y, x]
                        if cand_d < best_d:
                            best_d, best_l = cand_d, cand_l
                new_labels[y, x] = best_l
                new_dist[y, x] = best_d
        labels, dist = new_labels, new_dist
        if variant == "dasp" and sd != 0.0:
            inv = z < VALID
            labels = np.where(inv, -1, labels)
            dist = np.where(inv, 0.0, dist)
        if variant == "nasp" and (sd != 0.0 or sn != 0.0):
            inv = z < VALID
            labels = np.where(inv, -1, labels)
            dist = np.where(inv, 0.0, dist)

        # ---- update (plain stats)
        sums = np.zeros((k, 16))
        for y in range(h):
            for x in range(w):
                l = labels[y, x]
                if l < 0:
                    continue
                dx = x - c_xy[l, 0]
                dy = y - c_xy[l, 1]
                if not (wlo <= dx <= whi and wlo <= dy <= whi):
                    continue
                sums[l, 0:3] += color_f[y, x]
                sums[l, 3] += x
                sums[l, 4] += y
                sums[l, 5] += 1
                if variant == "dasp":
                    sums[l, 6:9] += points[y, x]
                    if z[y, x] > VALID:
                        sums[l, 9] += 1
                elif variant == "nasp":
                    if z[y, x] > VALID and _nvalid_or(normals[y, x]):
                        sums[l, 6:9] += points[y, x]
                        sums[l, 10:13] += normals[y, x]
                        sums[l, 9] += 1
        for l in range(k):
            if sums[l, 5] == 0:
                continue
            size = sums[l, 5]
            c_rgb[l] = np.clip(np.floor(sums[l, 0:3] / size), 0, 255)
            c_xy[l] = [int(sums[l, 3] // size), int(sums[l, 4] // size)]
            c_size[l] = size
            if variant == "dasp":
                if sums[l, 9] > 0:
                    c_center[l] = sums[l, 6:9] / sums[l, 9]
            elif variant == "nasp":
                if sums[l, 9] > 0:
                    px = min(max(c_xy[l, 0], 0), w - 1)
                    py = min(max(c_xy[l, 1], 0), h - 1)
                    if points[py, px, 2] > VALID:
                        c_center[l] = points[py, px]
                    else:
                        c_center[l] = sums[l, 6:9] / sums[l, 9]
                    c_normal[l] = sums[l, 10:13] / sums[l, 9]
                else:
                    c_center[l] = 0.0
                    c_normal[l] = -1.0

        # ---- NASP weighted pass
        if variant == "nasp":
            sums = np.zeros((k, 16))
            for y in range(h):
                for x in range(w):
                    l = labels[y, x]
                    if l < 0:
                        continue
                    dx = x - c_xy[l, 0]
                    dy = y - c_xy[l, 1]
                    if not (wlo <= dx <= whi and wlo <= dy <= whi):
                        continue
                    cd = color_f[y, x] - c_rgb[l]
                    cf = np.exp(-np.dot(cd, cd) / (2 * sc**2))
                    sf = np.exp(-(dx * dx + dy * dy) / (2 * ss**2))
                    wgt = cf * sf
                    sums[l, 0:3] += color_f[y, x] * wgt
                    sums[l, 3] += x * wgt
                    sums[l, 4] += y * wgt
                    sums[l, 5] += wgt
                    if z[y, x] > VALID and _nvalid_or(normals[y, x]):
                        dot = max(float(np.dot(normals[y, x], c_normal[l])), 0.0)
                        if 0.5 < dot <= 1.0:
                            sums[l, 6:9] += points[y, x]
                            sums[l, 10:13] += normals[y, x]
                            sums[l, 13] += dot
                            sums[l, 9] += 1
            for l in range(k):
                if sums[l, 5] == 0:
                    continue
                wsum = sums[l, 5]
                c_rgb[l] = np.clip(np.floor(sums[l, 0:3] / wsum), 0, 255)
                c_xy[l] = [int(sums[l, 3] / wsum), int(sums[l, 4] / wsum)]
                c_size[l] = int(wsum)
                if sums[l, 9] > 0:
                    px = min(max(c_xy[l, 0], 0), w - 1)
                    py = min(max(c_xy[l, 1], 0), h - 1)
                    if points[py, px, 2] > VALID:
                        c_center[l] = points[py, px]
                    else:
                        c_center[l] = sums[l, 6:9] / sums[l, 9]
                    nm = sums[l, 10:13] / sums[l, 9]
                    c_normal[l] = nm / max(np.linalg.norm(nm), 1e-30)
                    c_var[l] = sums[l, 13] / sums[l, 9]
                else:
                    c_center[l] = 0.0
                    c_normal[l] = -1.0
                    c_var[l] = 0.0

    return {
        "labels": labels,
        "distance": dist,
        "rgb": c_rgb,
        "xy": c_xy,
        "size": c_size,
        "center": c_center,
        "normal": c_normal,
        "variance": c_var,
        "seeds": seeds,
    }
