"""Pallas TPU kernel: fused SLIC seed-sampling gradient.

The XLA path (ops/slic.py::_color_gradient / _nasp_gradient, the 11x11
mean-colour-distance window of sampleInitialClusters,
SuperpixelSegmentation.cu:39-60 / NormalAdaptiveSuperpixel.cu:39-71) emits
~600 tiny fused kernels for the 121 window offsets; on the small seed
sub-grid arrays that is kernel-launch-bound (~2.9 ms of the 640x480 KDE
frame for ~0.1 ms of arithmetic).  This kernel runs the whole window sweep
VMEM-resident in ONE launch with the identical operation order, so results
are bitwise-equal to the XLA path (asserted by tests/test_pallas.py).

Layout: channel-major edge-padded planes [C, H+2R, WP] with the width
zero-padded to a lane multiple.  Column shifts are pltpu.roll — a roll of
<= R lanes only contaminates the >= R zero-pad columns outside the consumed
output region; row shifts are static slices (the pallas_cov.py recipe).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 5  # the 11x11 gradient window half-width (== slic._GRAD_MARGIN)
INVALID_NORMAL = -1.0


def _grad_kernel(cpad_ref, npad_ref, out_ref, *, h: int, wp: int, nasp: bool):
    """dy is unrolled (static row slices are free); dx runs under a
    lax.fori_loop with DYNAMIC pltpu.roll shifts — fully unrolling the 121
    offsets made Mosaic compile the 726 rolls for ~4.5 minutes; the loop
    form compiles in seconds.  The (dy outer, dx inner) accumulation order
    of the XLA path is preserved exactly, so outputs stay bitwise-equal."""
    a = [cpad_ref[i, R : R + h, :] for i in range(3)]
    if nasp:
        an = [npad_ref[i, R : R + h, :] for i in range(3)]
        valid_c = (
            (an[0] != INVALID_NORMAL)
            & (an[1] != INVALID_NORMAL)
            & (an[2] != INVALID_NORMAL)
        )
    sum_g = jnp.zeros((h, wp), jnp.float32)
    count = jnp.zeros((h, wp), jnp.float32)
    for dy in range(-R, R + 1):
        rc = [cpad_ref[i, R + dy : R + dy + h, :] for i in range(3)]
        if nasp:
            rn = [npad_ref[i, R + dy : R + dy + h, :] for i in range(3)]

        def dx_body(j, carry, rc=rc, rn=rn if nasp else None):
            sum_g, count = carry
            shift = (-(j - R)) % wp  # dx = j - R

            def sh(x):
                return pltpu.roll(x, shift, axis=1)

            nb = [sh(rc[i]) for i in range(3)]
            # identical op order to the XLA path: sum of squares over the
            # channel axis ((c0 + c1) + c2), then sqrt
            g = jnp.sqrt(
                (
                    jnp.square(a[0] - nb[0]) + jnp.square(a[1] - nb[1])
                )
                + jnp.square(a[2] - nb[2])
            )
            if nasp:
                nnb = [sh(rn[i]) for i in range(3)]
                both = valid_c & (
                    (nnb[0] != INVALID_NORMAL)
                    & (nnb[1] != INVALID_NORMAL)
                    & (nnb[2] != INVALID_NORMAL)
                )
                ndiff = jnp.abs(
                    (an[0] * nnb[0] + an[1] * nnb[1]) + an[2] * nnb[2]
                )
                g = jnp.where(both, g * (1.0 - ndiff), g)
            return sum_g + g, count + (g > 0.0).astype(jnp.float32)

        sum_g, count = jax.lax.fori_loop(
            0, 2 * R + 1, dx_body, (sum_g, count)
        )
    out_ref[0, :, :] = jnp.where(
        count > 0.0, sum_g / jnp.maximum(count, 1.0), jnp.inf
    )


def seed_gradient(
    color_f: jnp.ndarray,
    normals: jnp.ndarray | None = None,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """[H, W] seed gradient == slic._color_gradient(color_f) (normals=None)
    or slic._nasp_gradient(color_f, normals), bitwise, in one TPU launch."""
    h, w, _ = color_f.shape
    nasp = normals is not None
    wp = -(-(w + 2 * R) // 128) * 128

    def prep(x):
        p = jnp.pad(x, [(R, R), (R, R), (0, 0)], mode="edge")
        p = jnp.moveaxis(p, -1, 0)
        return jnp.pad(p, [(0, 0), (0, 0), (0, wp - w - 2 * R)])

    cpad = prep(color_f)
    npad = prep(normals) if nasp else jnp.zeros((3, h + 2 * R, wp), jnp.float32)

    try:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    except AttributeError:  # older JAX spelling
        compiler_params = pltpu.TPUCompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )

    kernel = functools.partial(_grad_kernel, h=h, wp=wp, nasp=nasp)
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec((3, h + 2 * R, wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, h + 2 * R, wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, h, wp), jnp.float32),
        interpret=interpret,
    )(cpad, npad)
    return out[0, :, R : R + w]


def available() -> bool:
    """Use the fused kernel on TPU backends (mirrors normals cov_impl auto)."""
    return jax.default_backend() == "tpu"
