"""Sharded execution of the pipelines over a ('data', 'x') mesh.

Strategy (SURVEY.md §5/§7): frames are data-parallel over 'data'; the image
plane is tiled over 'x' (width axis).  The pipelines are pure jnp programs
with static shapes, so XLA GSPMD partitions them from input shardings alone —
stencil pads become halo exchanges, segment-sums over the 300-cluster tables
become partial sums + AllReduce over ICI, and the tiny cluster-table
fixpoints replicate.  A hand-written shard_map halo-exchange path exists for
the production JBF stencil (parallel/stencil_shard.py, built on
parallel/halo.py) — bitwise-equal to the unsharded op and the only route for
running the Pallas kernels on spatially tiled inputs.

`dryrun(n)` is the driver hook: builds an n-device mesh, jits the FULL
batched KDE step with real input shardings and runs one step on tiny shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kinectdepthmapenhancement_tpu.core.camera import Intrinsics, default_kinect_intrinsics
from kinectdepthmapenhancement_tpu.core.config import GridParams, KDEConfig
from kinectdepthmapenhancement_tpu.models.pipelines import kde_pipeline
from kinectdepthmapenhancement_tpu.parallel.mesh import make_mesh


def disable_pallas(cfg: KDEConfig) -> KDEConfig:
    """cfg with every Pallas kernel replaced by its XLA-path twin (bitwise-
    equal semantics).  Required under GSPMD spatial sharding: a pallas_call
    is a black box to the partitioner — with a width-sharded operand XLA
    either fails to propagate a sharding or falls back to full replication
    (all-gather + redundant compute), so the sharded step must never reach
    one.  The XLA paths are ordinary jnp programs GSPMD partitions fine."""
    return dataclasses.replace(
        cfg,
        normals=dataclasses.replace(cfg.normals, cov_impl="xla", dt_impl="xla"),
        nasp=dataclasses.replace(cfg.nasp, grad_impl="xla", stats_impl="xla"),
    )


def sharded_kde_step(mesh: Mesh, intr: Intrinsics, cfg: KDEConfig):
    """Returns a jitted batched KDE step [B,H,W]x[B,H,W,3] -> [B,H,W,3] with
    batch sharded over 'data' and image width over 'x'.

    Two regimes (the Pallas/GSPMD interaction is handled explicitly):
      * spatial tiling ('x' > 1): GSPMD partitions the jnp pipeline from the
        input shardings; the Pallas kernels are force-disabled (see
        disable_pallas) so the partitioner never meets an opaque kernel.
      * pure data parallelism ('x' == 1): shard_map over 'data' — each
        device runs the complete pipeline on its local frames (zero
        cross-device collectives), so the Pallas fast paths stay enabled
        and see plain local arrays."""
    spatial = mesh.shape.get("x", 1) > 1
    if spatial:
        cfg = disable_pallas(cfg)
        depth_sharding = NamedSharding(mesh, P("data", None, "x"))
        color_sharding = NamedSharding(mesh, P("data", None, "x", None))
        out_sharding = NamedSharding(mesh, P("data", None, "x", None))

        def step(depth_b, color_b):
            return jax.vmap(
                lambda d, c: kde_pipeline(d, c, intr, cfg).optimized_points
            )(depth_b, color_b)

        return jax.jit(
            step,
            in_shardings=(depth_sharding, color_sharding),
            out_shardings=out_sharding,
        )

    try:  # jax >= 0.8
        from jax import shard_map
    except ImportError:  # older spelling
        from jax.experimental.shard_map import shard_map

    def local_step(depth_b, color_b):
        return jax.vmap(
            lambda d, c: kde_pipeline(d, c, intr, cfg).optimized_points
        )(depth_b, color_b)

    return jax.jit(
        shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P("data", None, None), P("data", None, None, None)),
            out_specs=P("data", None, None, None),
            # the Pallas kernels' out_shapes carry no varying-mesh-axes
            # metadata, which trips jax's vma check inside shard_map
            check_vma=False,
        )
    )


def dryrun(n_devices: int) -> None:
    """Compile + execute one sharded KDE step on tiny shapes (driver hook)."""
    spatial = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    mesh = make_mesh(n_devices, spatial=spatial)
    batch = mesh.shape["data"]

    h, w = 96, 128  # tiny but > 2*border so normals have a valid interior
    intr = default_kinect_intrinsics(w, h)
    cfg = dataclasses.replace(KDEConfig(), grid=GridParams(rows=3, cols=4))

    rng = np.random.default_rng(0)
    depth = jnp.asarray(
        rng.uniform(500.0, 4000.0, size=(batch, h, w)).astype(np.float32)
    )
    color = jnp.asarray(rng.integers(0, 255, size=(batch, h, w, 3), dtype=np.uint8))

    step = sharded_kde_step(mesh, intr, cfg)
    out = step(depth, color)
    jax.block_until_ready(out)
    assert out.shape == (batch, h, w, 3)

    # output parity vs an unsharded single-device run (same inputs): GSPMD
    # partitioning must not change results beyond reduction reordering
    single = jax.jit(
        jax.vmap(lambda d, c: kde_pipeline(d, c, intr, cfg).optimized_points)
    )
    want = single(
        jax.device_put(depth, jax.devices()[0]),
        jax.device_put(color, jax.devices()[0]),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=1e-4, atol=0.5
    )
    print(
        f"dryrun_multichip ok: mesh={dict(mesh.shape)} out={out.shape} "
        f"sharding={out.sharding} parity=ok"
    )
