"""Data-parallel scaling-efficiency benchmark (BASELINE.md north star:
>=80% multi-host scaling).

Measures batched KDE throughput over meshes of 1, 2, 4, ... N devices (batch
axis 'data'; one frame per device per dispatch) with unique inputs per timed
call, and reports efficiency vs the 1-device rate.

On this image only virtual CPU devices exist (--cpu N, default 8), which
shares one socket across "devices" — the numbers validate GSPMD partitioning
and collective placement, not ICI bandwidth.  On a real slice, run without
--cpu; on a pod, launch one process per host with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set (parallel/multihost.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 8
if "--cpu" in sys.argv:
    i = sys.argv.index("--cpu")
    if i + 1 < len(sys.argv) and sys.argv[i + 1].isdigit():
        N = int(sys.argv[i + 1])
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={N}"
        ).strip()

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from kinectdepthmapenhancement_tpu.core.camera import default_kinect_intrinsics
from kinectdepthmapenhancement_tpu.core.config import GridParams, KDEConfig
from kinectdepthmapenhancement_tpu.models.pipelines import kde_pipeline
from kinectdepthmapenhancement_tpu.parallel import multihost
from kinectdepthmapenhancement_tpu.parallel.mesh import make_mesh


def main() -> None:
    multihost.initialize()
    n_dev = len(jax.devices())
    small = "--small" in sys.argv or jax.default_backend() == "cpu"
    h, w = (96, 128) if small else (480, 640)
    intr = default_kinect_intrinsics(w, h)
    cfg = (
        KDEConfig(grid=GridParams(rows=3, cols=4)) if small else KDEConfig()
    )
    print(f"backend={jax.default_backend()} devices={n_dev} frame={h}x{w}", flush=True)

    rng = np.random.default_rng(0)
    base_fps = None
    widths = [x for x in (1, 2, 4, 8, 16, 32) if x <= n_dev]
    for n in widths:
        mesh = make_mesh(n, spatial=1)
        sh_d = NamedSharding(mesh, P("data", None, None))
        sh_c = NamedSharding(mesh, P("data", None, None, None))

        step = jax.jit(
            jax.vmap(lambda d, c: kde_pipeline(d, c, intr, cfg).optimized_points),
            in_shardings=(sh_d, sh_c),
            out_shardings=NamedSharding(mesh, P("data", None, None, None)),
        )

        color = jax.device_put(
            rng.integers(0, 255, (n, h, w, 3), dtype=np.uint8), sh_c
        )

        def batch(_):
            return jax.device_put(
                rng.uniform(500.0, 4000.0, (n, h, w)).astype(np.float32), sh_d
            )

        out = step(batch(0), color)  # compile + warm
        jax.block_until_ready(out)
        times = []
        for i in range(5):
            d = jax.block_until_ready(batch(i))
            t0 = time.perf_counter()
            r = step(d, color)
            float(jnp.sum(r))  # readback forces completion
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        fps = n / dt
        if base_fps is None:
            base_fps = fps
        eff = fps / (base_fps * n)
        print(
            f"data={n:3d}  batch_time={dt*1e3:8.2f} ms  fps={fps:8.2f}  "
            f"efficiency={eff*100:6.1f}%",
            flush=True,
        )


if __name__ == "__main__":
    main()
