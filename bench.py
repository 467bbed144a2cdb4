"""Benchmark entry point (driver contract: print ONE JSON line).

Measures the flagship KDE ("PROPOSED") pipeline end-to-end at the reference's
native 640x480 on the available accelerator, with block_until_ready timing
(utils/metrics.time_fn).  The reference publishes no numbers (BASELINE.md);
`vs_baseline` is fps relative to the Kinect v1 sensor ceiling of 30 fps —
the only rate the reference workload is defined against.
"""

import json
import sys


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kinectdepthmapenhancement_tpu.core.camera import default_kinect_intrinsics
    from kinectdepthmapenhancement_tpu.core.config import KDEConfig
    from kinectdepthmapenhancement_tpu.core.testdata import make_noisy_scene
    from kinectdepthmapenhancement_tpu.models.pipelines import kde_pipeline
    from kinectdepthmapenhancement_tpu.utils.metrics import time_fn

    h, w = 480, 640
    intr = default_kinect_intrinsics(w, h)
    color, depth, _ = make_noisy_scene(h, w, intr, seed=0)
    cfg = KDEConfig()

    step = jax.jit(lambda d, c: kde_pipeline(d, c, intr, cfg).optimized_points)
    d = jnp.asarray(depth)
    c = jnp.asarray(color)
    stats = time_fn(step, d, c, warmup=2, iters=10)
    fps = stats["fps"]
    print(
        json.dumps(
            {
                "metric": "kde_pipeline_fps_640x480",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
