"""Pallas TPU kernel: fused per-pixel covariance pyramid for CM normals.

The XLA path in ops/normals.py (direct_cov_all) accumulates 441 shifted-window
taps into [H, W, 10] running sums and snapshots a covariance at each of the 20
window sizes; XLA materialises many of those intermediates in HBM, making this
the most expensive stage of the KDE pipeline (~17 ms of a ~29 ms frame on a
v5e chip; the kernel runs the same sweep in ~2.1 ms).

This kernel keeps a row-slab of the vertex map resident in VMEM and performs
the whole incremental sweep on-chip: one HBM read of the inputs, one write of
the selected per-pixel (count, covariance) — the arithmetic, tap order, and
size selection are identical to the XLA path (NormalMapGenerator.cu:244-302's
nested windows; see ops/normals.py for the replicate/fix notes).

Layout: channel-major vertex planes [B, 3, Hpad, WP] with WP = width rounded
up to a lane multiple (640 stays 640 — round 5; the round-2..4 layout padded
16 zero columns each side and rounded 672 -> 768, wasting ~17% of the lanes).
Column shifts are pltpu.roll, which WRAPS across the row; wrapped lanes are
excluded by ANDing a static per-dx edge mask (0 <= x+dx < W) into the
validity compare — one extra logical op per tap, and each excluded lane
contributes the same exact zero the old zero-pads did, so results stay
bit-exact vs the XLA path.  Row shifts are static slab slices.  Outputs are
written at full padded width and sliced by the caller.

Batching: the grid iterates (batch, row-slab); jax.vmap dispatches here via a
custom_vmap rule (the manual-DMA ANY-space inputs have no generic Pallas
batching rule), so `jax.vmap(kde_pipeline)` works with the Pallas path on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_RECT = 21  # keep in sync with ops.normals.MAX_RECT
MAX_R = MAX_RECT >> 1  # largest |dy|/|dx| tap offset (10)
HALO = 16  # slab row halo (>= MAX_R, 8-aligned)


def _ring_taps():
    """Per-size NEW taps of the nested reference windows, in the exact
    accumulation order of ops.normals.direct_cov_all."""
    rings = {}
    prev: set = set()
    for s in range(2, MAX_RECT + 1):
        r2 = s >> 1
        taps = {
            (dy, dx)
            for dy in range(-r2, -r2 + s)
            for dx in range(-r2, -r2 + s)
        }
        rings[s] = sorted(taps - prev)
        prev = taps
    return rings


def _cov_kernel(
    vpad_hbm, rect_ref, out_ref, v_vmem, sem, *, tile: int, wp: int, w: int
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        vpad_hbm.at[b, :, pl.ds(i * tile, tile + 2 * HALO), :], v_vmem, sem
    )
    cp.start()
    cp.wait()

    a = v_vmem[:, HALO : HALO + tile, :]  # [3, tile, wp] centre vertices
    rect = rect_ref[0, :, :]

    # static per-dx edge masks: lane x's tap at x+dx is in-image iff
    # 0 <= x+dx < w; pltpu.roll wraps, so out-of-image lanes must be ANDed
    # out (they then contribute exact zeros, same as the old zero-pads)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    emask = {
        dx: (col >= -dx) & (col < w - dx)
        for dx in range(-MAX_R, MAX_R + 1)
    }

    zero = jnp.zeros((tile, wp), jnp.float32)
    cnt = zero
    s1 = [zero] * 3
    s2 = [zero] * 6
    out_cnt = zero
    out_cov = [zero] * 6

    for s, taps in _ring_taps().items():
        for dy, dx in taps:
            rows = v_vmem[:, HALO + dy : HALO + dy + tile, :]
            shifted = (
                pltpu.roll(rows, (-dx) % wp, axis=2) if dx != 0 else rows
            )
            m = ((shifted[2] != 0.0) & emask[dx]).astype(jnp.float32)
            res = [(shifted[c] - a[c]) * m for c in range(3)]
            cnt = cnt + m
            s1 = [s1[c] + res[c] for c in range(3)]
            prods = (
                res[0] * res[0], res[0] * res[1], res[0] * res[2],
                res[1] * res[1], res[1] * res[2], res[2] * res[2],
            )
            s2 = [s2[e] + prods[e] for e in range(6)]
        n_s = jnp.maximum(cnt, 1.0)
        outer = (
            s1[0] * s1[0], s1[0] * s1[1], s1[0] * s1[2],
            s1[1] * s1[1], s1[1] * s1[2], s1[2] * s1[2],
        )
        sel = (rect >= s) if s == MAX_RECT else (rect == s)
        out_cnt = jnp.where(sel, cnt, out_cnt)
        out_cov = [
            jnp.where(sel, s2[e] - outer[e] / n_s, out_cov[e]) for e in range(6)
        ]

    out_ref[0, 0, :, :] = out_cnt
    for e in range(6):
        out_ref[0, 1 + e, :, :] = out_cov[e]


def _cm_covariances_batched(
    vertices_m: jnp.ndarray,  # [B, H, W, 3]
    rect: jnp.ndarray,        # [B, H, W] i32
    *,
    tile: int,
    interpret: bool,
):
    bsz, h, w = rect.shape
    hp = -(-h // tile) * tile  # pad rows to a tile multiple
    wp = -(-w // 128) * 128  # lane multiple; 640 stays 640 (no column pads)
    vpad = jnp.pad(
        jnp.moveaxis(vertices_m, -1, 1),
        ((0, 0), (0, 0), (HALO, HALO + hp - h), (0, wp - w)),
    )
    rpad = jnp.pad(rect, ((0, 0), (0, hp - h), (0, wp - w)))

    try:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    except AttributeError:  # older JAX spelling
        compiler_params = pltpu.TPUCompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    kernel = functools.partial(_cov_kernel, tile=tile, wp=wp, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, hp // tile),
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, tile, wp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 7, tile, wp), lambda b, i: (b, 0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, 7, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, tile + 2 * HALO, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(vpad, rpad)
    out = out[:, :, :h, :w]
    return out[:, 0], jnp.moveaxis(out[:, 1:], 1, -1)


def _make_single(interpret: bool):
    @jax.custom_batching.custom_vmap
    def single(vertices_m: jnp.ndarray, rect: jnp.ndarray):
        cnt, cov = _cm_covariances_batched(
            vertices_m[None], rect[None], tile=48, interpret=interpret
        )
        return cnt[0], cov[0]

    @single.def_vmap
    def _vmap(axis_size, in_batched, vertices_m, rect):
        v_b, r_b = in_batched
        if not v_b:
            vertices_m = jnp.broadcast_to(
                vertices_m[None], (axis_size,) + vertices_m.shape
            )
        if not r_b:
            rect = jnp.broadcast_to(rect[None], (axis_size,) + rect.shape)
        out = _cm_covariances_batched(
            vertices_m, rect, tile=48, interpret=interpret
        )
        return out, (True, True)

    return single


_cm_covariances_single = _make_single(interpret=False)
_cm_covariances_single_interp = _make_single(interpret=True)


def cm_covariances(
    vertices_m: jnp.ndarray,
    rect: jnp.ndarray,
    *,
    tile: int = 48,
    interpret: bool = False,
):
    """Per-pixel (count, 6 covariance entries) at each pixel's own window size.

    vertices_m: [H, W, 3] f32 metres (zeros invalid); rect: [H, W] i32 window
    sizes.  Returns (cnt [H, W], cov entries [H, W, 6]) == the XLA path's
    _per_size(rect, 2..21, direct snapshots).  Bit-exact vs that path on TPU.

    Under jax.vmap the custom_vmap rule routes to the natively batched grid
    (for interpret mode too — the manual-DMA ANY-space inputs have no
    generic Pallas batching rule in either mode)."""
    if tile != 48:
        cnt, cov = _cm_covariances_batched(
            vertices_m[None], rect[None], tile=tile, interpret=interpret
        )
        return cnt[0], cov[0]
    fn = _cm_covariances_single_interp if interpret else _cm_covariances_single
    return fn(vertices_m, rect)
