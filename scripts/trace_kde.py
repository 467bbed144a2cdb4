"""Capture a jax.profiler device trace of the KDE pipeline (SURVEY.md §5).

Writes a TensorBoard-loadable trace to --out (default /tmp/kde_trace); the
per-stage jax.named_scope annotations in models/pipelines.py label the HLO
ops so stage costs are attributable in the trace viewer.

Usage: python scripts/trace_kde.py [--out DIR] [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from kinectdepthmapenhancement_tpu.core.camera import default_kinect_intrinsics
from kinectdepthmapenhancement_tpu.core.config import KDEConfig
from kinectdepthmapenhancement_tpu.core.testdata import make_noisy_scene
from kinectdepthmapenhancement_tpu.models.pipelines import kde_pipeline


def main() -> None:
    out = "/tmp/kde_trace"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]

    h, w = (480, 640) if "--cpu" not in sys.argv else (96, 128)
    intr = default_kinect_intrinsics(w, h)
    color_np, noisy_np, _ = make_noisy_scene(h, w, intr, seed=0)
    cfg = KDEConfig()

    depth = jnp.asarray(noisy_np)
    color = jnp.asarray(color_np)
    step = jax.jit(lambda d, c: kde_pipeline(d, c, intr, cfg).optimized_points)
    jax.block_until_ready(step(depth, color))  # compile outside the trace

    with jax.profiler.trace(out):
        for i in range(3):
            # unique inputs defeat the runtime's (executable, input) memo
            jax.block_until_ready(step(depth + jnp.float32(i) * 1e-3, color))
    print(f"trace written to {out} (load with tensorboard --logdir {out})")


if __name__ == "__main__":
    main()
