"""NumPy loop transliteration of SAMG + NormalMapGenerator.

Same documented fixes as ops/normals.py (deterministic DCI, clamped border
reads, unconditional SDC flip).  Box sums are computed directly (f64) over the
reference's inclusive-integral window: rows (v, v+vv] x cols (u, u+uu].
"""

from __future__ import annotations

import numpy as np

FLT_EPSILON = 1.19209290e-07


def dci_map(vm, max_depth_change=0.05):
    z = vm[..., 2]
    h, w = z.shape
    dci = np.full((h, w), 255, np.int64)
    for y in range(h):
        for x in range(w):
            zc = z[y, x]
            zr = z[y, min(x + 1, w - 1)]
            zd = z[min(y + 1, h - 1), x]
            thr = max_depth_change * (abs(zc) + 1.0) * 2.0
            if abs(zc - zr) > thr or zc == 0.0 or zr == 0.0:
                dci[y, x] = 0
                dci[y, min(x + 1, w - 1)] = 0
            if abs(zc - zd) > thr or zc == 0.0 or zd == 0.0:
                dci[y, x] = 0
                dci[min(y + 1, h - 1), x] = 0
    return dci


def distance_transform(dci):
    """Chamfer DT to the fixpoint (the clean spec of ops/normals.py).

    The reference's single two-pass sweep skips row/col 0 in one direction
    each, so its border band can exceed the true chamfer distance; both
    implementations here converge to the exact fixpoint instead (the border
    band lies inside the invalid normal border downstream, SURVEY.md §2
    contract notes)."""
    h, w = dci.shape
    dt = np.where(dci == 0, 0.0, float(w + h))
    nbrs = [(-1, -1, 1.4), (-1, 0, 1.0), (-1, 1, 1.4), (0, -1, 1.0),
            (0, 1, 1.0), (1, -1, 1.4), (1, 0, 1.0), (1, 1, 1.4)]
    changed = True
    while changed:
        changed = False
        for ri in range(h):
            for ci in range(w):
                for dy, dx, c in nbrs:
                    yy, xx = ri + dy, ci + dx
                    if 0 <= yy < h and 0 <= xx < w and dt[yy, xx] + c < dt[ri, ci]:
                        dt[ri, ci] = dt[yy, xx] + c
                        changed = True
    return dt


def smoothing_map(vm, max_depth_change=0.05, size=20.0):
    dci = dci_map(vm, max_depth_change)
    dt = distance_transform(dci)
    ddsa = size + vm[..., 2] / 10.0
    return np.minimum(dt, ddsa)


def _box(arr, u, v, uu, vv):
    """Sum over rows (v, v+vv] x cols (u, u+uu] with clipping."""
    h, w = arr.shape[:2]
    r0 = min(max(v + 1, 0), h)
    r1 = min(max(v + vv + 1, 0), h)
    c0 = min(max(u + 1, 0), w)
    c1 = min(max(u + uu + 1, 0), w)
    if r1 <= r0 or c1 <= c0:
        return 0.0
    return arr[r0:r1, c0:c1].sum()


def _compute_roots2(b, c):
    d = b * b - 4.0 * c
    if d < 0.0:
        d = 0.0
    sd = np.sqrt(d)
    return np.array([0.0, 0.5 * (b - sd), 0.5 * (b + sd)])


def _compute_roots(m):
    c0 = (
        m[0] * m[4] * m[8]
        + 2.0 * m[1] * m[2] * m[5]
        - m[0] * m[5] * m[5]
        - m[4] * m[2] * m[2]
        - m[8] * m[1] * m[1]
    )
    c1 = m[0] * m[4] - m[1] * m[1] + m[0] * m[8] - m[2] * m[2] + m[4] * m[8] - m[5] * m[5]
    c2 = m[0] + m[4] + m[8]
    if abs(c0) < FLT_EPSILON:
        return _compute_roots2(c2, c1)
    s_inv3 = 1.0 / 3.0
    s_sqrt3 = np.sqrt(3.0)
    c2_over_3 = c2 * s_inv3
    a_over_3 = min((c1 - c2 * c2_over_3) * s_inv3, 0.0)
    half_b = 0.5 * (c0 + c2_over_3 * (2.0 * c2_over_3 * c2_over_3 - c1))
    q = min(half_b * half_b + a_over_3**3, 0.0)
    rho = np.sqrt(-a_over_3)
    theta = np.arctan2(np.sqrt(-q), half_b) * s_inv3
    r = np.array(
        [
            c2_over_3 + 2.0 * rho * np.cos(theta),
            c2_over_3 - rho * (np.cos(theta) + s_sqrt3 * np.sin(theta)),
            c2_over_3 - rho * (np.cos(theta) - s_sqrt3 * np.sin(theta)),
        ]
    )
    r = np.sort(r)
    if r[0] <= 0:
        return _compute_roots2(c2, c1)
    return r


def smallest_eigenvector(mat9):
    m = np.array(mat9, np.float64)
    scale = max(np.abs(m).max(), 0.0)
    if scale <= np.finfo(np.float64).tiny:
        scale = 1.0
    s = m / scale
    roots = _compute_roots(s)
    ev = roots[0] * scale
    s[0] -= roots[0]
    s[4] -= roots[0]
    s[8] -= roots[0]
    vecs = [
        np.array([s[1] * s[5] - s[2] * s[4], s[2] * s[3] - s[0] * s[5], s[0] * s[4] - s[1] * s[3]]),
        np.array([s[1] * s[8] - s[2] * s[7], s[2] * s[6] - s[0] * s[8], s[0] * s[7] - s[1] * s[6]]),
        np.array([s[4] * s[8] - s[5] * s[7], s[5] * s[6] - s[3] * s[8], s[3] * s[7] - s[4] * s[6]]),
    ]
    lens = [np.linalg.norm(v) for v in vecs]
    i = int(np.argmax(lens))
    # the reference prefers vec1 >= vec2 >= vec3 on ties; argmax picks first max
    return ev, vecs[i] / lens[i]


def cm_normals(vm, smooth, border=20):
    h, w = vm.shape[:2]
    out = np.full((h, w, 3), -1.0)
    x, y, z = vm[..., 0], vm[..., 1], vm[..., 2]
    valid = (z != 0.0).astype(np.float64)
    chans = [x, y, z, x * x, x * y, x * z, y * y, y * z, z * z]
    for py in range(h):
        for px in range(w):
            if px <= border or px >= w - border or py <= border or py >= h - border:
                continue
            s = smooth[py, px]
            if s <= 2.0:
                continue
            rect = int(s)
            r2 = rect >> 1
            u, v = px - r2 - 1, py - r2 - 1
            cont = _box(valid, u, v, rect, rect)
            if cont == 0:
                continue
            bs = [_box(c, u, v, rect, rect) for c in chans]
            sx, sy, sz, sxx, sxy, sxz, syy, syz, szz = bs
            mat = [
                sxx - sx * sx / cont, sxy - sx * sy / cont, sxz - sx * sz / cont,
                sxy - sx * sy / cont, syy - sy * sy / cont, syz - sy * sz / cont,
                sxz - sx * sz / cont, syz - sy * sz / cont, szz - sz * sz / cont,
            ]
            _, vec = smallest_eigenvector(mat)
            if vec[2] < 0.0:
                out[py, px] = [vec[0], -vec[1], vec[2]]
            else:
                out[py, px] = [-vec[0], vec[1], -vec[2]]
    return out


def sdc_normals(vm, smooth, border=20):
    h, w = vm.shape[:2]
    out = np.full((h, w, 3), -1.0)
    z = vm[..., 2]
    valid = (z != 0.0).astype(np.float64)
    zc = z * valid

    def P(yy, xx):
        return vm[min(max(yy, 0), h - 1), min(max(xx, 0), w - 1)]

    for py in range(h):
        for px in range(w):
            if px < border or px > w - border or py < border or py > h - border:
                continue
            s = smooth[py, px]
            if s <= 2.0:
                continue
            rect = int(s)
            r2, r4 = rect >> 1, rect >> 2
            cont = _box(valid, px - r2 - 1, py - r2 - 1, rect, rect)
            if cont == 0:
                continue
            cL = _box(valid, px - r2 - 1, py - r4 - 1, r2, r2)
            cR = _box(valid, px, py - r4 - 1, r2, r2)
            cU = _box(valid, px - r4 - 1, py - r2 - 1, r2, r2)
            cD = _box(valid, px - r4 - 1, py, r2, r2)
            if cL == 0 or cR == 0 or cU == 0 or cD == 0:
                continue
            mL = _box(zc, px - r2 - 1, py - r4 - 1, r2, r2) / cL
            mR = _box(zc, px, py - r4 - 1, r2, r2) / cR
            mU = _box(zc, px - r4 - 1, py - r2 - 1, r2, r2) / cU
            mD = _box(zc, px - r4 - 1, py, r2, r2) / cD
            pL = P(py, px - r4 - 1)
            pR = P(py, px + r4 + 1)
            pU = P(py - r4, px - 1)
            pD = P(py + r4, px + 1)
            mxz, myz = mR - mL, mD - mU
            mxx, mxy = pR[0] - pL[0], pR[1] - pL[1]
            myx, myy = pD[0] - pU[0], pD[1] - pU[1]
            nx = mxz * myy - mxy * myz
            ny = -(mxx * myz - mxz * myx)
            nz = mxy * myx - mxx * myy
            l2 = nx * nx + ny * ny + nz * nz
            if l2 == 0.0:
                continue
            cos_theta = -(vm[py, px, 0] * nx + vm[py, px, 1] * ny + vm[py, px, 2] * nz)
            if cos_theta <= 0:
                nx, ny, nz = -nx, -ny, -nz
            sc = 1.0 / np.sqrt(l2)
            out[py, px] = [nx * sc, ny * sc, nz * sc]
    return out


def rest_and_flip(normal, vm):
    h, w = vm.shape[:2]
    out = normal.copy()
    z = vm[..., 2]

    def P(yy, xx):
        return vm[min(max(yy, 0), h - 1), min(max(xx, 0), w - 1)]

    for y in range(h):
        for x in range(w):
            if np.all(out[y, x] == -1.0):
                r = 1 if P(y, x + 1)[2] != 0.0 else -1
                ph01 = P(y, x + r)
                pv01 = P(y + r, x)
                p0 = vm[y, x]
                vh = ph01 - p0
                vv = pv01 - p0
                dh = np.linalg.norm(ph01 - p0)
                dv = np.linalg.norm(pv01 - p0)
                if p0[2] != 0.0 and dh < p0[2] * 0.01 and dv < p0[2] * 0.01:
                    n = np.array(
                        [
                            vh[2] * vv[1] - vh[1] * vv[2],
                            -(vh[0] * vv[2] - vh[2] * vv[0]),
                            vh[1] * vv[0] - vh[0] * vv[1],
                        ]
                    )
                    nn = np.linalg.norm(n)
                    if nn > 0:
                        n = n / -nn
                    out[y, x] = n
            if np.any(out[y, x] != -1.0):
                out[y, x] = out[y, x] * np.array([-1.0, 1.0, -1.0])
    return out


def bilateral_normals(vm):
    h, w = vm.shape[:2]
    out = np.full((h, w, 3), -1.0)

    def P(yy, xx):
        return vm[min(max(yy, 0), h - 1), min(max(xx, 0), w - 1)]

    for y in range(h):
        for x in range(w):
            p0 = vm[y, x]
            if p0[2] == 0.0:
                continue
            r = 1 if P(y, x + 1)[2] != 0.0 else -1
            vh = P(y, x + r) - p0
            vv = P(y + r, x) - p0
            n = np.array(
                [
                    vh[2] * vv[1] - vh[1] * vv[2],
                    -(vh[0] * vv[2] - vh[2] * vv[0]),
                    vh[1] * vv[0] - vh[0] * vv[1],
                ]
            )
            nn = np.linalg.norm(n)
            if nn > 0:
                n = n / -nn
            out[y, x] = n * np.array([-1.0, 1.0, -1.0])
    return out


def generate(points_mm, method="cm", size=20.0, mdc=0.05):
    vm = points_mm / 1000.0
    if method == "bilateral":
        return bilateral_normals(vm)
    sm = smoothing_map(vm, mdc, size)
    raw = cm_normals(vm, sm, int(size)) if method == "cm" else sdc_normals(vm, sm, int(size))
    return rest_and_flip(raw, vm)
