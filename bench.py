"""Benchmark entry point (driver contract: print ONE JSON line).

Measures the flagship KDE ("PROPOSED") pipeline end-to-end at the reference's
native 640x480 on the available accelerator.  The reference publishes no
numbers (BASELINE.md); `vs_baseline` is fps relative to the BASELINE.md
north-star chip rate of 125 fps/chip (2000 fps aggregate on a v5e-16,
pro-rata per chip).  The 30 fps Kinect-v1 sensor ceiling is reported
separately as `x_kinect_sensor_ceiling_30fps`.

Headline value = steady-state device throughput, measured by chaining K
data-dependent pipeline iterations inside ONE executable and differencing
two K values (PERF.md methodology).  This isolates the framework's per-frame
device time from the test harness's per-dispatch RPC floor (~30 ms through
the axon tunnel) and from H2D input uploads — in production serving both
overlap compute; neither caching nor constant folding can fake it because
every chained iteration consumes a perturbation of the previous output.
Dispatch-inclusive batched throughput and single-dispatch latency are also
reported as secondary fields.
"""

import json
import sys


def main() -> None:
    import jax

    try:  # persistent compile cache: remote TPU compiles are expensive
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
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

    # dispatch-inclusive throughput at several batch sizes: a batch of
    # distinct frames in ONE dispatch (vmap), so the ~30 ms per-dispatch
    # host<->device round-trip of this harness amortises as in real serving
    def batched_fps(batch: int, iters: int = 5) -> float:
        def make_args(i):
            # unique contents per timed call: defeats the runtime result cache
            rng = np.random.default_rng(1000 + i)
            d = depth[None] + rng.normal(0, 4.0, (batch, h, w)).astype(np.float32)
            return (jnp.asarray(d), c)

        stats = time_pipeline(
            lambda d, c_: jax.vmap(
                lambda dd: kde_pipeline(dd, c_, intr, cfg).optimized_points
            )(d),
            make_args,
            iters=iters,
        )
        return batch / stats["median_s"]

    # the serving curve {1, 4, 16, 32} ships in the default JSON (VERDICT r4
    # #4); each width is a separate XLA compile through the remote tunnel,
    # amortised by the persistent compile cache.  --quick keeps the old
    # single-width behaviour for ad-hoc runs.
    widths = (4,) if "--quick" in sys.argv else (1, 4, 16, 32)
    batch_sweep = {b: round(batched_fps(b), 2) for b in widths}
    fps = batch_sweep[4]

    # steady-state device throughput: chain K data-dependent pipeline
    # applications inside one executable; fps = (hi-lo)/(t_hi-t_lo)
    import time as _time

    d0 = jnp.asarray(depth)

    def chained(k_static):
        def body(_, dd):
            out = kde_pipeline(dd, color=c, intr=intr, cfg=cfg).optimized_points
            s = jnp.sum(out.astype(jnp.float32)) * 1e-30
            return d0 + s.astype(d0.dtype)  # fresh, data-dependent next frame

        def fn(d):
            return jnp.sum(jax.lax.fori_loop(0, k_static, body, d))

        return jax.jit(fn)

    lo_k, hi_k = 3, 9
    f_lo, f_hi = chained(lo_k), chained(hi_k)
    float(f_lo(d0)), float(f_hi(d0))  # compile + warm
    spans = []
    for _ in range(3):
        t0 = _time.perf_counter(); float(f_lo(d0)); t_lo = _time.perf_counter() - t0
        t0 = _time.perf_counter(); float(f_hi(d0)); t_hi = _time.perf_counter() - t0
        spans.append((t_hi - t_lo) / (hi_k - lo_k))
    per_frame = float(np.median(spans))
    device_fps = 1.0 / per_frame if per_frame > 0 else float("inf")

    def make_args1(i):
        rng = np.random.default_rng(2000 + i)
        d = depth[None] + rng.normal(0, 4.0, (1, h, w)).astype(np.float32)
        return (jnp.asarray(d), c)

    lat = time_pipeline(
        lambda d, c_: kde_pipeline(d[0], c_, intr, cfg).optimized_points,
        make_args1,
        iters=5,
    )

    # --- MFU / roofline accounting (PERF.md "Roofline model") -------------
    # Static per-frame flops/bytes from XLA's own cost model of the single-
    # frame executable; peaks per device kind.  "bytes accessed" is XLA's
    # logical operand traffic — an UPPER bound on true HBM bytes (fusion
    # keeps much of it in VMEM/registers), so hbm_bw_util is conservative-
    # high; mfu uses the bf16 MXU peak, the standard denominator.
    PEAKS = {  # device_kind -> (peak bf16 flops/s, HBM bytes/s)
        "TPU v5 lite": (197e12, 819e9),
        "TPU v5": (459e12, 1228e9),
        "TPU v4": (275e12, 1228e9),
        "TPU v6 lite": (918e12, 1640e9),
    }
    mfu = hbm_util = flops_per_frame = None
    try:
        compiled = (
            jax.jit(lambda d, c_: kde_pipeline(d, c_, intr, cfg).optimized_points)
            .lower(jnp.asarray(depth), c)
            .compile()
        )
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops_per_frame = float(ca["flops"])
        bytes_per_frame = float(ca["bytes accessed"])
        kind = jax.devices()[0].device_kind
        peak = next((v for k, v in PEAKS.items() if kind.startswith(k)), None)
        if peak and per_frame > 0:
            mfu = flops_per_frame / per_frame / peak[0]
            hbm_util = bytes_per_frame / per_frame / peak[1]
    except Exception:
        pass  # cost model unavailable on this runtime; report fps only

    print(
        json.dumps(
            {
                "metric": "kde_pipeline_fps_640x480",
                "value": round(device_fps, 2),
                "unit": "frames/s",
                # vs_baseline: fps / the pro-rata north-star rate of
                # 125 fps/chip (2000 fps aggregate on a v5e-16, BASELINE.md)
                # — the honest comparator (the old fps/30-sensor-ceiling
                # ratio is retired per VERDICT r4; the sensor ceiling is
                # reported under its own name below)
                "vs_baseline": round(device_fps / 125.0, 4),
                "vs_chip_target": round(device_fps / 125.0, 4),
                "x_kinect_sensor_ceiling_30fps": round(device_fps / 30.0, 2),
                "device_frame_ms": round(per_frame * 1e3, 3),
                "dispatch_inclusive_fps_batch4": round(fps, 2),
                "dispatch_inclusive_fps_by_batch": batch_sweep,
                "single_dispatch_latency_ms": round(lat["median_s"] * 1e3, 2),
                "gflops_per_frame": (
                    round(flops_per_frame / 1e9, 2) if flops_per_frame else None
                ),
                "mfu": round(mfu, 5) if mfu else None,
                # XLA cost-model operand bytes / time / HBM peak.  The cost
                # model counts LOGICAL operand traffic, which fusion keeps out
                # of HBM, so values can exceed 1.0; when they do the figure
                # bounds nothing and is flagged instead of reported as a util.
                "hbm_bw_util_cost_model": (
                    round(hbm_util, 4) if hbm_util and hbm_util <= 1.0 else None
                ),
                "hbm_cost_model_note": (
                    "cost-model operand bytes exceed HBM peak "
                    f"({round(hbm_util, 2)}x): fusion overcount, not a util"
                    if hbm_util and hbm_util > 1.0
                    else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
