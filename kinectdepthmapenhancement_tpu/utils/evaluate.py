"""Single-frame evaluation harness mirroring the reference's main().

Runs INPUT / JBF / MRF / RGBF / KDE (+ optionally SPDSP, TOF) on one frame,
times each method and computes the mean 3-D error against a ground-truth
depth, writing an `evaluation.txt` in the same spirit as main.cpp:158-309.

Usage:
    python -m kinectdepthmapenhancement_tpu.utils.evaluate [out.txt]
"""

from __future__ import annotations

import sys
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from kinectdepthmapenhancement_tpu.core.camera import (
    default_kinect_intrinsics,
    projective_to_real,
)
from kinectdepthmapenhancement_tpu.core.config import (
    KDEConfig,
    RGBFConfig,
    SPDSPConfig,
    TOFConfig,
)
from kinectdepthmapenhancement_tpu.core.testdata import make_noisy_scene
from kinectdepthmapenhancement_tpu.models import pipelines
from kinectdepthmapenhancement_tpu.utils import metrics


def evaluate(
    depth: np.ndarray,
    color: np.ndarray,
    gt_depth: np.ndarray,
    *,
    include_sp_methods: bool = True,
) -> Dict[str, Dict[str, float]]:
    h, w = depth.shape
    intr = default_kinect_intrinsics(w, h)
    d = jnp.asarray(depth)
    c = jnp.asarray(color)
    gt_pts = projective_to_real(jnp.asarray(gt_depth), intr)
    in_pts = projective_to_real(d, intr)

    runs = {
        "input": lambda: in_pts,
        "jbf": lambda: projective_to_real(
            pipelines.jbf_pipeline(d, c), intr
        ),
        "mrf": lambda: projective_to_real(
            pipelines.mrf_pipeline(d, c), intr
        ),
        "rgbf": lambda: projective_to_real(
            pipelines.rgbf_pipeline(d, in_pts, c, RGBFConfig()).refined_depth, intr
        ),
        "kde": lambda: pipelines.kde_pipeline(d, c, intr, KDEConfig()).optimized_points,
    }
    if include_sp_methods:
        runs["spdsp"] = lambda: pipelines.spdsp_pipeline(
            d, in_pts, c, intr, SPDSPConfig()
        ).optimized_points
        runs["tof"] = lambda: pipelines.tof_pipeline(
            d, in_pts, c, intr, TOFConfig()
        ).plane_fitted

    out: Dict[str, Dict[str, float]] = {}
    for name, fn in runs.items():
        jit_fn = jax.jit(fn)
        pts = jax.block_until_ready(jit_fn())  # compile + run
        t0 = time.perf_counter()
        pts = jax.block_until_ready(jit_fn())
        dt = time.perf_counter() - t0
        err, n = metrics.mean_3d_error(pts, gt_pts)
        rmse = metrics.depth_rmse(pts[..., 2], jnp.asarray(gt_depth))
        out[name] = {
            "time_ms": dt * 1e3,
            "mean_3d_error_mm": float(err),
            "rmse_mm": float(rmse),
            "valid_px": int(n),
        }
    return out


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "evaluation.txt"
    color, noisy, gt = make_noisy_scene(480, 640, default_kinect_intrinsics(), seed=0)
    results = evaluate(noisy, color, gt)
    lines = ["runtime"]
    for name, r in results.items():
        lines.append(f"{name}: {r['time_ms']:.3f} ms")
    lines.append("error")
    for name, r in results.items():
        lines.append(
            f"{name} {r['mean_3d_error_mm']:.6f}  (rmse {r['rmse_mm']:.3f} mm, "
            f"n={r['valid_px']})"
        )
    text = "\n".join(lines) + "\n"
    with open(path, "w") as f:
        f.write(text)
    print(text)


if __name__ == "__main__":
    main()
