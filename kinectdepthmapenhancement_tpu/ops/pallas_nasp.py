"""Pallas TPU kernel: fused NASP cluster-statistics sweeps.

The NASP cluster updates (analyzeClusters_NASP, NormalAdaptiveSuperpixel.cu:
356-685, and calculateWeightedAverage, cu:687-1068) reduce per-pixel features
into per-cluster sums.  The XLA cell route (ops/slic.py::_CellIndex) does
this as one-hot matmuls in [rows, cols, P, n] cell space, which needs two
[H, W, 13-14] layout transposes plus a gather of per-pixel cluster fields —
~1.4 ms of the 5.4 ms KDE frame on a v5e chip, most of it pure data movement.

This kernel computes the same per-(cell, candidate) sums in ONE pass over the
image with zero layout changes:

  * grid = cell rows; each program owns a [bs_y, Wp] slab — single-iteration
    SLIC labels are cell-local, so slabs never interact;
  * candidate cluster fields live in a tiny expanded map [rows+2r, nf, Wp]
    (field value of the cell at each lane's column, dx=0).  The (dy, dx)
    candidate of a pixel is a row offset + a LANE ROLL by dx*bs_x — the >=
    2r*bs_x zero/sentinel pad columns make out-of-grid candidates read id -9,
    which never equals a label, so no explicit bounds masks are needed;
  * per-pixel assigned-cluster fields (the XLA path's idx.gather) are a
    64-way select chain on (label == candidate id);
  * per-offset masked feature sums reduce over sublanes on the VPU and over
    lanes -> cell columns by a [Wp, colsp] 0/1 matmul on the MXU.

Outputs are the candidate-space partial sums [rows, n*F, colsp]; the caller
folds them to [K, F] with the same tiny one-hot matmul as the XLA route, so
everything downstream is untouched.  Sums differ from the XLA path only in
f32 accumulation order (both are exact selections of identical per-pixel
feature values).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VALID_DEPTH_MM = 50.0
INVALID_NORMAL = -1.0
SENTINEL_ID = -9.0

N_ANALYZE = 13   # color3, u, v, 1, p*acc 3, n*acc 3, acc
N_WEIGHTED = 14  # color3*w, u*w, v*w, w, p*acc 3, n*acc 3, dclamp*acc, acc


def _sweep(n: int, body, init, unrolled: bool):
    """Run an offset sweep either UNROLLED (static row slices + static lane
    rolls: what Mosaic pipelines best on TPU — the fori form costs ~25%
    runtime) or under lax.fori_loop (what keeps interpret-mode XLA compiles
    tractable: the unrolled form took minutes to build).  The body sees the
    same j sequence either way, so results are identical."""
    if unrolled:
        carry = init
        for j in range(n):
            carry = body(j, carry)
        return carry
    return jax.lax.fori_loop(0, n, body, init)


def _stats_kernel(
    planes_ref,  # [9, bs_y, wp] f32: color 3, points 3, normals 3 (slab)
    lab_ref,     # [bs_y, wp] f32 labels (-1 invalid; pad lanes -1)
    exp_ref,     # [rows + 2r, nf, wp] f32 candidate maps (id, x, y[, rgb, n])
    fold_ref,    # [wp, colsp] f32 0/1 lane -> cell-column fold
    out_ref,     # [1, n*F, colsp] f32
    *,
    mode: str,
    rows: int,
    r: int,
    bs_x: int,
    bs_y: int,
    wp: int,
    colsp: int,
    lo: float,
    hi: float,
    color_sigma: float,
    spatial_sigma: float,
    unrolled: bool,
):
    pid = pl.program_id(0)
    nf = exp_ref.shape[1]
    n = (2 * r) ** 2
    lab = lab_ref[...]
    color = [planes_ref[i] for i in range(3)]
    pts = [planes_ref[3 + i] for i in range(3)]
    nrm = [planes_ref[6 + i] for i in range(3)]

    def maps_at(j):
        """[nf, wp] candidate field maps of offset index j (dy-major order,
        matching slic._CellIndex.cand).  The row index and the lane-roll
        shift are TRACED — the offset sweeps run under lax.fori_loop because
        unrolling 64 offsets x several passes makes Mosaic/interpret compile
        times explode (the pallas_gradient.py lesson)."""
        dy = j // (2 * r) - r
        dx = j % (2 * r) - r
        base = exp_ref[pl.ds(pid + dy + r, 1)][0]  # [nf, wp]
        return pltpu.roll(base, ((-dx) * bs_x) % wp, axis=1)

    # ---- pass A: select the ASSIGNED cluster's fields per pixel
    def body_sel(j, sel):
        maps = maps_at(j)
        m = lab == maps[0:1]
        return tuple(
            jnp.where(m, maps[f : f + 1], sel[f - 1]) for f in range(1, nf)
        )

    sel = _sweep(
        n, body_sel,
        tuple(jnp.zeros((bs_y, wp), jnp.float32) for _ in range(nf - 1)),
        unrolled,
    )

    u = jax.lax.broadcasted_iota(jnp.int32, (bs_y, wp), 1).astype(jnp.float32)
    v = (
        jax.lax.broadcasted_iota(jnp.int32, (bs_y, wp), 0).astype(jnp.float32)
        + jnp.float32(bs_y) * pid.astype(jnp.float32)
    )
    c_x, c_y = sel[0], sel[1]
    dxp = u - c_x
    dyp = v - c_y
    inside = (
        (dxp >= lo) & (dxp <= hi) & (dyp >= lo) & (dyp <= hi) & (lab >= 0.0)
    )

    nvalid = (
        (nrm[0] != INVALID_NORMAL)
        | (nrm[1] != INVALID_NORMAL)
        | (nrm[2] != INVALID_NORMAL)
    )
    if mode == "analyze":
        acc = ((pts[2] > VALID_DEPTH_MM) & nvalid).astype(jnp.float32)
        feats = (
            color[0], color[1], color[2], u, v, jnp.ones((bs_y, wp), jnp.float32),
            pts[0] * acc, pts[1] * acc, pts[2] * acc,
            nrm[0] * acc, nrm[1] * acc, nrm[2] * acc, acc,
        )
    else:
        c_rgb = sel[2:5]
        c_n = sel[5:8]
        cdiff = (
            jnp.square(color[0] - c_rgb[0]) + jnp.square(color[1] - c_rgb[1])
        ) + jnp.square(color[2] - c_rgb[2])
        cfilt = jnp.exp(-cdiff / (2.0 * color_sigma**2))
        sdiff = jnp.square(dxp) + jnp.square(dyp)
        sfilt = jnp.exp(-sdiff / (2.0 * spatial_sigma**2))
        wgt = cfilt * sfilt
        dot = (nrm[0] * c_n[0] + nrm[1] * c_n[1]) + nrm[2] * c_n[2]
        dclamp = jnp.maximum(dot, 0.0)
        acc = (
            (pts[2] > VALID_DEPTH_MM)
            & nvalid
            & (dclamp > 0.5)
            & (dclamp <= 1.0)
        ).astype(jnp.float32)
        feats = (
            color[0] * wgt, color[1] * wgt, color[2] * wgt,
            u * wgt, v * wgt, wgt,
            pts[0] * acc, pts[1] * acc, pts[2] * acc,
            nrm[0] * acc, nrm[1] * acc, nrm[2] * acc,
            dclamp * acc, acc,
        )

    # ---- pass B: per-offset masked sums, folded to cell columns on the MXU
    fold = fold_ref[...]
    nfeat = len(feats)

    def body_sums(j, carry):
        maps = maps_at(j)
        mm = ((lab == maps[0:1]) & inside).astype(jnp.float32)
        s = jnp.concatenate(
            [jnp.sum(f * mm, axis=0, keepdims=True) for f in feats]
        )  # [F, wp]
        o = jax.lax.dot(s, fold, preferred_element_type=jnp.float32)
        out_ref[0, pl.ds(j * nfeat, nfeat), :] = o
        return carry

    _sweep(n, body_sums, 0, unrolled)


def _label_sums_kernel(
    feats_ref,   # [F, bs_y, wp] f32 pre-masked feature planes (slab)
    lab_ref,     # [bs_y, wp] f32 labels (-1 invalid; pad lanes -1)
    exp_ref,     # [rows + 2r, 1, wp] f32 candidate id maps
    fold_ref,    # [wp, colsp] f32 0/1 lane -> cell-column fold
    out_ref,     # [1, n*F, colsp] f32
    *,
    rows: int,
    r: int,
    bs_x: int,
    bs_y: int,
    wp: int,
    colsp: int,
    nfeat: int,
    unrolled: bool,
):
    """Generic per-(cell, candidate) sums of arbitrary pre-masked feature
    planes — the Pallas twin of _CellIndex.segment_sum for consumers outside
    the NASP update (plane-fit residual, counts)."""
    pid = pl.program_id(0)
    n = (2 * r) ** 2
    lab = lab_ref[...]
    feats = [feats_ref[f] for f in range(nfeat)]
    fold = fold_ref[...]

    def body(j, carry):
        dy = j // (2 * r) - r
        dx = j % (2 * r) - r
        base = exp_ref[pl.ds(pid + dy + r, 1)][0]  # [1, wp]
        idm = pltpu.roll(base, ((-dx) * bs_x) % wp, axis=1)
        mm = (lab == idm[0:1]).astype(jnp.float32)
        s = jnp.concatenate(
            [jnp.sum(f * mm, axis=0, keepdims=True) for f in feats]
        )
        o = jax.lax.dot(s, fold, preferred_element_type=jnp.float32)
        out_ref[0, pl.ds(j * nfeat, nfeat), :] = o
        return carry

    _sweep(n, body, 0, unrolled)


def label_cell_sums(
    labels: jnp.ndarray,  # [H, W] i32 cell-local labels
    feats: jnp.ndarray,   # [H, W, F] f32, already masked (invalid rows 0)
    *,
    rows: int,
    cols: int,
    r: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-(cell, candidate) sums [rows*cols*n, F] of `feats` grouped by the
    cell-local labels; candidate order == slic._CellIndex.cand.  The caller
    folds to [K, F] with the candidate one-hot exactly like the XLA route."""
    h, w = labels.shape
    bs_y, bs_x = h // rows, w // cols
    n = (2 * r) ** 2
    nfeat = feats.shape[-1]
    wp = -(-(w + 2 * r * bs_x) // 128) * 128
    colsp = -(-cols // 128) * 128

    ids = jnp.arange(rows * cols, dtype=jnp.float32).reshape(rows, cols, 1)
    pad_row = jnp.full((r, cols, 1), SENTINEL_ID, jnp.float32)
    exp = jnp.concatenate([pad_row, ids, pad_row], axis=0)
    exp = jnp.repeat(exp, bs_x, axis=1)
    exp = jnp.pad(exp, ((0, 0), (0, wp - w), (0, 0)), constant_values=SENTINEL_ID)
    exp = jnp.moveaxis(exp, -1, 1)  # [rows+2r, 1, wp]

    fplanes = jnp.pad(
        jnp.moveaxis(feats.astype(jnp.float32), -1, 0),
        ((0, 0), (0, 0), (0, wp - w)),
    )
    lab = jnp.pad(
        labels.astype(jnp.float32), ((0, 0), (0, wp - w)), constant_values=-1.0
    )
    lane_cell = jnp.arange(wp) // bs_x
    fold = (
        (lane_cell[:, None] == jnp.arange(colsp)[None, :])
        & (jnp.arange(wp) < w)[:, None]
    ).astype(jnp.float32)

    kernel = functools.partial(
        _label_sums_kernel,
        rows=rows,
        r=r,
        bs_x=bs_x,
        bs_y=bs_y,
        wp=wp,
        colsp=colsp,
        nfeat=nfeat,
        unrolled=not interpret,
    )
    try:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    except AttributeError:  # older JAX spelling
        compiler_params = pltpu.TPUCompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid=(rows,),
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec(
                (nfeat, bs_y, wp), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((bs_y, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(exp.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fold.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n * nfeat, colsp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, n * nfeat, colsp), jnp.float32),
        interpret=interpret,
    )(fplanes, lab, exp, fold)

    out = out.reshape(rows, n, nfeat, colsp)[..., :cols]
    return jnp.transpose(out, (0, 3, 1, 2)).reshape(-1, nfeat)


def _label_gather_kernel(
    lab_ref,     # [bs_y, wp] f32 labels (-1 invalid; pad lanes -1)
    exp_ref,     # [rows + 2r, 1 + F, wp] f32: id + table field maps
    out_ref,     # [F, bs_y, wp] f32
    *,
    rows: int,
    r: int,
    bs_x: int,
    bs_y: int,
    wp: int,
    nfeat: int,
    unrolled: bool,
):
    """table[labels] for cell-local labels — the Pallas twin of
    _CellIndex.gather (a 64-way select over expanded candidate maps; exact:
    values are copied, never combined; 0 where no candidate matches)."""
    pid = pl.program_id(0)
    n = (2 * r) ** 2
    lab = lab_ref[...]

    def body(j, sel):
        dy = j // (2 * r) - r
        dx = j % (2 * r) - r
        base = exp_ref[pl.ds(pid + dy + r, 1)][0]  # [1+F, wp]
        maps = pltpu.roll(base, ((-dx) * bs_x) % wp, axis=1)
        m = lab == maps[0:1]
        return tuple(
            jnp.where(m, maps[f + 1 : f + 2], sel[f]) for f in range(nfeat)
        )

    sel = _sweep(
        n, body,
        tuple(jnp.zeros((bs_y, wp), jnp.float32) for _ in range(nfeat)),
        unrolled,
    )
    for f in range(nfeat):
        out_ref[f] = sel[f]


def label_cell_gather(
    labels: jnp.ndarray,  # [H, W] i32 cell-local labels
    table: jnp.ndarray,   # [K, F] f32
    *,
    rows: int,
    cols: int,
    r: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """[H, W, F] = table[labels] (0 for labels outside the candidate set)."""
    h, w = labels.shape
    bs_y, bs_x = h // rows, w // cols
    nfeat = table.shape[-1]
    wp = -(-(w + 2 * r * bs_x) // 128) * 128

    ids = jnp.arange(rows * cols, dtype=jnp.float32).reshape(rows, cols, 1)
    exp = jnp.concatenate(
        [ids, table.astype(jnp.float32).reshape(rows, cols, nfeat)], axis=-1
    )
    pad_row = jnp.zeros((r, cols, 1 + nfeat), jnp.float32).at[..., 0].set(
        SENTINEL_ID
    )
    exp = jnp.concatenate([pad_row, exp, pad_row], axis=0)
    exp = jnp.repeat(exp, bs_x, axis=1)
    exp = jnp.pad(exp, ((0, 0), (0, wp - w), (0, 0)))
    exp = exp.at[:, w:, 0].set(SENTINEL_ID)
    exp = jnp.moveaxis(exp, -1, 1)  # [rows+2r, 1+F, wp]

    lab = jnp.pad(
        labels.astype(jnp.float32), ((0, 0), (0, wp - w)), constant_values=-1.0
    )
    kernel = functools.partial(
        _label_gather_kernel,
        rows=rows,
        r=r,
        bs_x=bs_x,
        bs_y=bs_y,
        wp=wp,
        nfeat=nfeat,
        unrolled=not interpret,
    )
    out = pl.pallas_call(
        kernel,
        grid=(rows,),
        in_specs=[
            pl.BlockSpec((bs_y, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(exp.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nfeat, bs_y, wp), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nfeat, h, wp), jnp.float32),
        interpret=interpret,
    )(lab, exp)
    return jnp.moveaxis(out[:, :, :w], 0, -1)


INIT_DISTANCE = 999999.9  # slic.INIT_DISTANCE (not-in-grid candidate cost)


def _assign_analyze_kernel(
    planes_ref,  # [9, bs_y, wp] f32: color 3, points 3, normals 3 (slab)
    exp_ref,     # [rows + 2r, 10, wp] f32: id, rgb 3, x, y, center_z, normal 3
    fold_ref,    # [wp, colsp] f32 0/1 lane -> cell-column fold
    lab_out,     # [bs_y, wp] f32 labels
    dist_out,    # [bs_y, wp] f32 distances
    sums_out,    # [1, n*N_ANALYZE, colsp] f32
    *,
    rows: int,
    r: int,
    bs_x: int,
    bs_y: int,
    wp: int,
    colsp: int,
    lo: float,
    hi: float,
    w_col: float,
    w_spa: float,
    w_dep: float,
    w_nor: float,
    s_scale: float,
    apply_invalid: bool,
    unrolled: bool,
):
    """NASP first-iteration assignment (calculateLD_NASP,
    NormalAdaptiveSuperpixel.cu:184-354, cell_fast form: candidates are a
    pure function of the grid cell) fused with the analyze stats sweep —
    identical distance arithmetic and offset order to the XLA band-space
    path, so labels match it."""
    pid = pl.program_id(0)
    n = (2 * r) ** 2
    color = [planes_ref[i] for i in range(3)]
    pts = [planes_ref[3 + i] for i in range(3)]
    nrm = [planes_ref[6 + i] for i in range(3)]
    zc = pts[2]

    def maps_at(j):
        """See _stats_kernel.maps_at — offset sweeps run under fori_loop."""
        dy = j // (2 * r) - r
        dx = j % (2 * r) - r
        base = exp_ref[pl.ds(pid + dy + r, 1)][0]  # [10, wp]
        return pltpu.roll(base, ((-dx) * bs_x) % wp, axis=1)

    u = jax.lax.broadcasted_iota(jnp.int32, (bs_y, wp), 1).astype(jnp.float32)
    v = (
        jax.lax.broadcasted_iota(jnp.int32, (bs_y, wp), 0).astype(jnp.float32)
        + jnp.float32(bs_y) * pid.astype(jnp.float32)
    )
    nv_pix = (
        (nrm[0] != INVALID_NORMAL)
        | (nrm[1] != INVALID_NORMAL)
        | (nrm[2] != INVALID_NORMAL)
    )
    own_id = exp_ref[pl.ds(pid + r, 1)][0][0:1]  # grid-init label per lane

    def body_dist(j, carry):
        bd, bl = carry
        maps = maps_at(j)
        rid = maps[0:1]
        c_rgb = maps[1:4]
        c_x, c_y = maps[4:5], maps[5:6]
        c_cz = maps[6:7]
        c_n = maps[7:10]
        cd = (
            jnp.square(color[0] - c_rgb[0:1])
            + jnp.square(color[1] - c_rgb[1:2])
        ) + jnp.square(color[2] - c_rgb[2:3])
        pd = jnp.sqrt(jnp.square(u - c_x) + jnp.square(v - c_y)) * (
            s_scale**2
        )
        zpair = (zc > VALID_DEPTH_MM) & (c_cz > VALID_DEPTH_MM)
        dd = jnp.where(zpair, jnp.abs(zc - c_cz), 0.0)
        dist = cd * w_col + pd * w_spa + dd * w_dep
        nv_cand = (
            (c_n[0:1] != INVALID_NORMAL)
            | (c_n[1:2] != INVALID_NORMAL)
            | (c_n[2:3] != INVALID_NORMAL)
        )
        npair = zpair & nv_pix & nv_cand
        dot = (
            nrm[0] * c_n[0:1] + nrm[1] * c_n[1:2]
        ) + nrm[2] * c_n[2:3]
        nd = jnp.where(
            npair, 255.0**2 * (1.0 - jnp.maximum(dot, 0.0)), 0.0
        )
        dist = dist + nd * w_nor
        ing = rid >= 0.0
        cand_d = jnp.where(ing, dist, INIT_DISTANCE)
        cand_l = jnp.where(ing, rid, own_id)
        take = cand_d < bd
        return jnp.where(take, cand_d, bd), jnp.where(take, cand_l, bl)

    bd, bl = _sweep(
        n, body_dist,
        (
            jnp.full((bs_y, wp), jnp.inf, jnp.float32),
            jnp.full((bs_y, wp), -1.0, jnp.float32),
        ),
        unrolled,
    )

    if apply_invalid:
        invalid = zc < VALID_DEPTH_MM
        bl = jnp.where(invalid, -1.0, bl)
        bd = jnp.where(invalid, 0.0, bd)
    lab_out[...] = bl
    dist_out[...] = bd

    # ---- analyze stats over the freshly assigned labels (same code shape
    # as _stats_kernel mode="analyze")
    def body_sel(j, sel):
        maps = maps_at(j)
        m = bl == maps[0:1]
        return (
            jnp.where(m, maps[4:5], sel[0]),
            jnp.where(m, maps[5:6], sel[1]),
        )

    sel_x, sel_y = _sweep(
        n, body_sel,
        (
            jnp.zeros((bs_y, wp), jnp.float32),
            jnp.zeros((bs_y, wp), jnp.float32),
        ),
        unrolled,
    )

    dxp = u - sel_x
    dyp = v - sel_y
    inside = (
        (dxp >= lo) & (dxp <= hi) & (dyp >= lo) & (dyp <= hi) & (bl >= 0.0)
    )
    acc = ((zc > VALID_DEPTH_MM) & nv_pix).astype(jnp.float32)
    feats = (
        color[0], color[1], color[2], u, v, jnp.ones((bs_y, wp), jnp.float32),
        pts[0] * acc, pts[1] * acc, pts[2] * acc,
        nrm[0] * acc, nrm[1] * acc, nrm[2] * acc, acc,
    )
    fold = fold_ref[...]
    nfeat = len(feats)

    def body_sums(j, carry):
        maps = maps_at(j)
        mm = ((bl == maps[0:1]) & inside).astype(jnp.float32)
        s = jnp.concatenate(
            [jnp.sum(f * mm, axis=0, keepdims=True) for f in feats]
        )
        o = jax.lax.dot(s, fold, preferred_element_type=jnp.float32)
        sums_out[0, pl.ds(j * nfeat, nfeat), :] = o
        return carry

    _sweep(n, body_sums, 0, unrolled)


def nasp_assign_and_analyze(
    color_f: jnp.ndarray,      # [H, W, 3] f32
    points: jnp.ndarray,       # [H, W, 3] f32 mm
    normals: jnp.ndarray,      # [H, W, 3] f32
    cand_fields: jnp.ndarray,  # [rows, cols, 9]: rgb3, x, y, center_z, normal3
    *,
    rows: int,
    cols: int,
    r: int,
    lo: float,
    hi: float,
    w_col: float,
    w_spa: float,
    w_dep: float,
    w_nor: float,
    s_scale: float,
    apply_invalid: bool,
    interpret: bool = False,
):
    """Fused NASP first-iteration assignment + analyze sums.  Returns
    (labels [H, W] i32, distance [H, W] f32, part_flat [rows*cols*n, 13])."""
    h, w = color_f.shape[:2]
    bs_y, bs_x = h // rows, w // cols
    n = (2 * r) ** 2
    wp = -(-(w + 2 * r * bs_x) // 128) * 128
    colsp = -(-cols // 128) * 128

    ids = jnp.arange(rows * cols, dtype=jnp.float32).reshape(rows, cols, 1)
    exp = jnp.concatenate([ids, cand_fields.astype(jnp.float32)], axis=-1)
    nf = exp.shape[-1]
    pad_row = jnp.zeros((r, cols, nf), jnp.float32).at[..., 0].set(SENTINEL_ID)
    exp = jnp.concatenate([pad_row, exp, pad_row], axis=0)
    exp = jnp.repeat(exp, bs_x, axis=1)
    exp = jnp.pad(exp, ((0, 0), (0, wp - w), (0, 0)))
    exp = exp.at[:, w:, 0].set(SENTINEL_ID)
    exp = jnp.moveaxis(exp, -1, 1)  # [rows+2r, nf, wp]

    planes = jnp.concatenate([color_f, points, normals], axis=-1)
    planes = jnp.pad(jnp.moveaxis(planes, -1, 0), ((0, 0), (0, 0), (0, wp - w)))

    lane_cell = jnp.arange(wp) // bs_x
    fold = (
        (lane_cell[:, None] == jnp.arange(colsp)[None, :])
        & (jnp.arange(wp) < w)[:, None]
    ).astype(jnp.float32)

    kernel = functools.partial(
        _assign_analyze_kernel,
        rows=rows,
        r=r,
        bs_x=bs_x,
        bs_y=bs_y,
        wp=wp,
        colsp=colsp,
        lo=float(lo),
        hi=float(hi),
        w_col=float(w_col),
        w_spa=float(w_spa),
        w_dep=float(w_dep),
        w_nor=float(w_nor),
        s_scale=float(s_scale),
        apply_invalid=apply_invalid,
        unrolled=not interpret,
    )
    try:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    except AttributeError:  # older JAX spelling
        compiler_params = pltpu.TPUCompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    lab, dist, sums = pl.pallas_call(
        kernel,
        grid=(rows,),
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec((9, bs_y, wp), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(exp.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fold.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bs_y, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs_y, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, n * N_ANALYZE, colsp), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, wp), jnp.float32),
            jax.ShapeDtypeStruct((h, wp), jnp.float32),
            jax.ShapeDtypeStruct((rows, n * N_ANALYZE, colsp), jnp.float32),
        ],
        interpret=interpret,
    )(planes, exp, fold)

    labels = lab[:, :w].astype(jnp.int32)
    distance = dist[:, :w]
    out = sums.reshape(rows, n, N_ANALYZE, colsp)[..., :cols]
    part_flat = jnp.transpose(out, (0, 3, 1, 2)).reshape(-1, N_ANALYZE)
    return labels, distance, part_flat


def nasp_cell_sums(
    labels: jnp.ndarray,       # [H, W] i32 single-iteration NASP labels
    color_f: jnp.ndarray,      # [H, W, 3] f32
    points: jnp.ndarray,       # [H, W, 3] f32 mm
    normals: jnp.ndarray,      # [H, W, 3] f32
    cand_fields: jnp.ndarray,  # [rows, cols, nf-1] f32 per-cluster fields
    *,
    rows: int,
    cols: int,
    r: int,
    lo: float,
    hi: float,
    mode: str,
    color_sigma: float = 1.0,
    spatial_sigma: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-(cell, candidate-offset) feature sums [rows*cols*n, F], candidate
    order == slic._CellIndex.cand, feature order == the XLA feats layout of
    _update_nasp_analyze / _update_nasp_weighted.  The caller folds to [K, F]
    with the candidate one-hot (identical post-processing either route)."""
    assert mode in ("analyze", "weighted")
    h, w = labels.shape
    bs_y, bs_x = h // rows, w // cols
    n = (2 * r) ** 2
    nfeat = N_ANALYZE if mode == "analyze" else N_WEIGHTED
    wp = -(-(w + 2 * r * bs_x) // 128) * 128
    colsp = -(-cols // 128) * 128

    ids = (
        jnp.arange(rows * cols, dtype=jnp.float32).reshape(rows, cols, 1)
    )
    exp = jnp.concatenate([ids, cand_fields.astype(jnp.float32)], axis=-1)
    nf = exp.shape[-1]
    # pad grid rows with sentinel-id rows, expand cols -> lanes, pad lanes
    pad_row = jnp.zeros((r, cols, nf), jnp.float32).at[..., 0].set(SENTINEL_ID)
    exp = jnp.concatenate([pad_row, exp, pad_row], axis=0)
    exp = jnp.repeat(exp, bs_x, axis=1)  # [rows+2r, W, nf]
    exp = jnp.pad(exp, ((0, 0), (0, wp - w), (0, 0)))
    exp = exp.at[:, w:, 0].set(SENTINEL_ID)
    exp = jnp.moveaxis(exp, -1, 1)  # [rows+2r, nf, wp]

    planes = jnp.concatenate([color_f, points, normals], axis=-1)
    planes = jnp.pad(jnp.moveaxis(planes, -1, 0), ((0, 0), (0, 0), (0, wp - w)))
    lab = jnp.pad(
        labels.astype(jnp.float32), ((0, 0), (0, wp - w)), constant_values=-1.0
    )

    lane_cell = jnp.arange(wp) // bs_x
    fold = (
        (lane_cell[:, None] == jnp.arange(colsp)[None, :])
        & (jnp.arange(wp) < w)[:, None]
    ).astype(jnp.float32)

    kernel = functools.partial(
        _stats_kernel,
        mode=mode,
        rows=rows,
        r=r,
        bs_x=bs_x,
        bs_y=bs_y,
        wp=wp,
        colsp=colsp,
        lo=float(lo),
        hi=float(hi),
        color_sigma=float(color_sigma),
        spatial_sigma=float(spatial_sigma),
        unrolled=not interpret,
    )
    try:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    except AttributeError:  # older JAX spelling
        compiler_params = pltpu.TPUCompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid=(rows,),
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec((9, bs_y, wp), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs_y, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(exp.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fold.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n * nfeat, colsp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, n * nfeat, colsp), jnp.float32),
        interpret=interpret,
    )(planes, lab, exp, fold)

    # [rows, n, F, colsp] -> [rows, cols, n, F] -> [rows*cols*n, F]
    out = out.reshape(rows, n, nfeat, colsp)[..., :cols]
    return jnp.transpose(out, (0, 3, 1, 2)).reshape(-1, nfeat)


def available() -> bool:
    return jax.default_backend() == "tpu"
