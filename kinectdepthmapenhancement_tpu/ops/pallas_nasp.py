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
):
    pid = pl.program_id(0)
    nf = exp_ref.shape[1]
    lab = lab_ref[...]
    color = [planes_ref[i] for i in range(3)]
    pts = [planes_ref[3 + i] for i in range(3)]
    nrm = [planes_ref[6 + i] for i in range(3)]

    def cand_rows(dy):
        """[nf, wp] candidate field maps of cell row pid+dy (dx=0)."""
        blk = exp_ref[pl.ds(pid + dy + r, 1)]  # [1, nf, wp]
        return blk[0]

    def rolled(row_maps, dx):
        """Candidate maps displaced dx cells along the lanes."""
        if dx == 0:
            return row_maps
        return pltpu.roll(row_maps, (-dx * bs_x) % wp, axis=1)

    # ---- pass A: select the ASSIGNED cluster's fields per pixel
    sel = [jnp.zeros((bs_y, wp), jnp.float32) for _ in range(nf - 1)]
    for dy in range(-r, r):
        base = cand_rows(dy)
        for dx in range(-r, r):
            maps = rolled(base, dx)
            m = lab == maps[0:1]
            for f in range(1, nf):
                sel[f - 1] = jnp.where(m, maps[f : f + 1], sel[f - 1])

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
    chunks = []
    for dy in range(-r, r):
        base = cand_rows(dy)
        for dx in range(-r, r):
            maps = rolled(base, dx)
            mm = ((lab == maps[0:1]) & inside).astype(jnp.float32)
            s = jnp.concatenate(
                [jnp.sum(f * mm, axis=0, keepdims=True) for f in feats]
            )  # [F, wp]
            chunks.append(
                jax.lax.dot(s, fold, preferred_element_type=jnp.float32)
            )
    out_ref[0] = jnp.concatenate(chunks, axis=0)  # [n*F, colsp]


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
