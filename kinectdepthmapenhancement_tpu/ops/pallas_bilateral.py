"""Pallas TPU kernel: fused two-pass joint bilateral depth filter.

The XLA path in ops/bilateral.py materialises pass-1 means in HBM and runs
2 x 25 shifted-window traversals; this kernel keeps a row-slab of depth +
guide resident in VMEM and computes both passes in one sweep per tile —
one HBM read of the inputs, one write of the output.

Grid: row tiles.  Each program manually DMAs a (TILE + 4)-row slab (2-row
halo each side, zero padded by the caller) from HBM to VMEM, then runs the
statically unrolled 5x5 window with pltpu.roll for column shifts and lane
masks reproducing the zero-pad/bounds semantics of the reference
(JointBilateralFilter.cu:17-21).  Arithmetic is identical to the jnp path.

Guide channels are passed as [3, H+4, W] planes so the lane dimension stays
the image width (128-aligned for 640).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kinectdepthmapenhancement_tpu.core.buffer2d import VALID_DEPTH_MM
from kinectdepthmapenhancement_tpu.core.config import JBFParams


def _shift_cols(x: jnp.ndarray, dx: int, w: int) -> jnp.ndarray:
    """x displaced by dx columns with zeros shifted in (zero-pad semantics)."""
    if dx == 0:
        return x
    rolled = pltpu.roll(x, (-dx) % x.shape[1], axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    ok = (lane + dx >= 0) & (lane + dx < w)
    return jnp.where(ok, rolled, 0.0)


HALO = 4  # DMA slab rows must be 8-aligned; only window//2 rows are used


def _jbf_kernel(
    dpad_hbm, gpad_hbm, out_ref, d_vmem, g_vmem, sem_d, sem_g,
    *, tile: int, w: int, window: int, spatial, color_sigma, depth_sigma,
):
    i = pl.program_id(0)
    r = window // 2
    cp_d = pltpu.make_async_copy(
        dpad_hbm.at[pl.ds(i * tile, tile + 2 * HALO), :], d_vmem, sem_d
    )
    cp_g = pltpu.make_async_copy(
        gpad_hbm.at[:, pl.ds(i * tile, tile + 2 * HALO), :], g_vmem, sem_g
    )
    cp_d.start()
    cp_g.start()
    cp_d.wait()
    cp_g.wait()

    d_c = d_vmem[HALO : HALO + tile, :]
    g_c = [g_vmem[c, HALO : HALO + tile, :] for c in range(3)]

    def tap_values(dy, dx):
        nd = _shift_cols(d_vmem[HALO + dy : HALO + dy + tile, :], dx, w)
        ng = [
            _shift_cols(g_vmem[c, HALO + dy : HALO + dy + tile, :], dx, w)
            for c in range(3)
        ]
        valid = nd > VALID_DEPTH_MM
        cdiff = (
            (g_c[0] - ng[0]) ** 2 + (g_c[1] - ng[1]) ** 2 + (g_c[2] - ng[2]) ** 2
        )
        # sigma-gated terms (see ops/bilateral.py docstring on the fixed
        # value-guard quirk); sigmas are static Python floats here
        base = jnp.full_like(nd, spatial[dy + r][dx + r])
        if color_sigma != 0.0:
            base = base * jnp.exp(-cdiff / (2.0 * color_sigma**2))
        return nd, valid, base

    # pass 1: spatial x colour weighted mean of valid depth
    wsum = jnp.zeros_like(d_c)
    dsum = jnp.zeros_like(d_c)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            nd, valid, base = tap_values(dy, dx)
            filt = jnp.where(valid, base, 0.0)
            dsum = dsum + nd * filt
            wsum = wsum + filt
    mean = dsum / jnp.where(wsum > 0.0, wsum, 1.0)

    # pass 2: x depth term against the pass-1 mean
    num = jnp.zeros_like(d_c)
    den = jnp.zeros_like(d_c)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            nd, valid, base = tap_values(dy, dx)
            filt = base
            if depth_sigma != 0.0:
                filt = filt * jnp.exp(-((nd - mean) ** 2) / (2.0 * depth_sigma**2))
            filt = jnp.where(valid, filt, 0.0)
            num = num + nd * filt
            den = den + filt
    out = jnp.where(den != 0.0, num / jnp.where(den != 0.0, den, 1.0), 0.0)
    out_ref[:, :] = jnp.where(wsum > 0.0, out, 0.0)


def jbf_pallas(
    depth: jnp.ndarray,
    guide: jnp.ndarray,
    p: JBFParams = JBFParams(),
    *,
    tile: int = 48,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused JBF on a pre-smoothed guide.  depth [H, W] f32 mm; guide
    [H, W, 3] f32.  H must be divisible by `tile` (the caller pads)."""
    h, w = depth.shape
    r = p.window // 2
    assert h % tile == 0, (h, tile)
    import math

    spatial = [
        [
            math.exp(-((dx * dx + dy * dy)) / (2.0 * p.spatial_sigma**2))
            for dx in range(-r, r + 1)
        ]
        for dy in range(-r, r + 1)
    ]
    dpad = jnp.pad(depth, ((HALO, HALO), (0, 0)))
    gpad = jnp.pad(
        jnp.moveaxis(guide, -1, 0), ((0, 0), (HALO, HALO), (0, 0))
    )  # [3, H+2*HALO, W]

    kernel = functools.partial(
        _jbf_kernel,
        tile=tile,
        w=w,
        window=p.window,
        spatial=spatial,
        color_sigma=p.color_sigma,
        depth_sigma=p.depth_sigma,
    )
    return pl.pallas_call(
        kernel,
        grid=(h // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * HALO, w), jnp.float32),
            pltpu.VMEM((3, tile + 2 * HALO, w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(dpad, gpad)
