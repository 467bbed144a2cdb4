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

    import numpy as np

    from kinectdepthmapenhancement_tpu.core.camera import default_kinect_intrinsics
    from kinectdepthmapenhancement_tpu.core.config import KDEConfig
    from kinectdepthmapenhancement_tpu.core.testdata import make_noisy_scene
    from kinectdepthmapenhancement_tpu.models.pipelines import kde_pipeline
    from kinectdepthmapenhancement_tpu.utils.timing import time_pipeline

    h, w = 480, 640
    intr = default_kinect_intrinsics(w, h)
    color, depth, _ = make_noisy_scene(h, w, intr, seed=0)
    cfg = KDEConfig()

    c = jnp.asarray(color)

    def make_args(i):
        # unique contents per timed call: defeats the runtime's result cache
        return (jnp.asarray(depth + np.float32(i + 1) * 0.25), c)

    stats = time_pipeline(
        lambda d, c_: kde_pipeline(d, c_, intr, cfg).optimized_points,
        make_args,
        iters=5,
    )
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
