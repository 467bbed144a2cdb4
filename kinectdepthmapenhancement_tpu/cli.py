"""Command-line interface — the file-replay entry point of the reference
(main.cpp:139-201) as a proper CLI.

  python -m kinectdepthmapenhancement_tpu enhance \
      --depth experiment/depth.xml --color experiment/color.jpg \
      --pipeline kde --out refined.xml [--ply cloud.ply] [--png depth.png]

  python -m kinectdepthmapenhancement_tpu evaluate out.txt [--full]

`enhance` reads a cv::FileStorage XML depth ("depth" node, mm) + colour
image, runs one pipeline, writes the refined depth back as FileStorage XML
and optional PLY / PNG debug renders (the reference's PCL viewer + imwrite
hooks).  `evaluate` runs the timing+accuracy harness (evaluation.txt analog).
"""

from __future__ import annotations

import argparse
import sys


def _cmd_enhance(args: argparse.Namespace) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kinectdepthmapenhancement_tpu.core import io
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
    from kinectdepthmapenhancement_tpu.models import pipelines
    from kinectdepthmapenhancement_tpu.utils import visualize

    color = io.imread_rgb(args.color)
    mats = io.read_filestorage_xml(args.depth)
    if args.depth_node not in mats:
        raise SystemExit(
            f"node {args.depth_node!r} not in {args.depth} (has {list(mats)})"
        )
    depth = mats[args.depth_node].astype(np.float32)
    h, w = depth.shape
    if color.shape[:2] != (h, w):
        raise SystemExit(f"color {color.shape[:2]} != depth {(h, w)}")
    intr = default_kinect_intrinsics(w, h)

    d = jnp.asarray(depth)
    c = jnp.asarray(color)
    name = args.pipeline
    if name == "jbf":
        refined = jax.jit(lambda a, b: pipelines.jbf_pipeline(a, b))(d, c)
        points = projective_to_real(refined, intr)
    elif name == "mrf":
        refined = jax.jit(lambda a, b: pipelines.mrf_pipeline(a, b))(d, c)
        points = projective_to_real(refined, intr)
    elif name == "rgbf":
        pts = projective_to_real(d, intr)
        res = jax.jit(
            lambda a, p, b: pipelines.rgbf_pipeline(a, p, b, RGBFConfig())
        )(d, pts, c)
        refined = res.refined_depth
        points = projective_to_real(refined, intr)
    elif name == "kde":
        cfg = KDEConfig()
        res = jax.jit(
            lambda a, b: pipelines.kde_pipeline(a, b, intr, cfg)
        )(d, c)
        points = res.optimized_points
        refined = points[..., 2]
        if args.debug_dir:
            written = visualize.dump_kde_debug(
                args.debug_dir, res, c, cfg.grid.num_clusters
            )
            print(f"wrote {len(written)} debug renders to {args.debug_dir}")
    elif name == "spdsp":
        pts = projective_to_real(d, intr)
        res = jax.jit(
            lambda a, p, b: pipelines.spdsp_pipeline(a, p, b, intr, SPDSPConfig())
        )(d, pts, c)
        points = res.optimized_points
        refined = points[..., 2]
    elif name == "tof":
        pts = projective_to_real(d, intr)
        res = jax.jit(
            lambda a, p, b: pipelines.tof_pipeline(a, p, b, intr, TOFConfig())
        )(d, pts, c)
        points = res.plane_fitted
        refined = points[..., 2]
    else:  # pragma: no cover - argparse already constrains choices
        raise SystemExit(f"unknown pipeline {name}")

    refined = jax.block_until_ready(refined)
    io.write_filestorage_xml(args.out, {"depth": np.asarray(refined)})
    print(f"wrote {args.out}")
    if args.ply:
        cloud = visualize.point_cloud(points, c)
        visualize.save_ply(args.ply, cloud)
        print(f"wrote {args.ply} ({cloud.shape[0]} points)")
    if args.png:
        visualize.save_png(args.png, visualize.depth_rgb(refined))
        print(f"wrote {args.png}")
    return 0


def _cmd_evaluate(args: argparse.Namespace) -> int:
    from kinectdepthmapenhancement_tpu.utils import evaluate

    grid = None
    if args.grid:
        from kinectdepthmapenhancement_tpu.core.config import GridParams

        rows, cols = (int(t) for t in args.grid.lower().split("x"))
        grid = GridParams(rows=rows, cols=cols)
    methods = args.methods.split(",") if args.methods else None
    if args.tum:
        results = evaluate.evaluate_tum(
            args.tum,
            frames=args.frames,
            include_sp_methods=args.full,
            grid=grid,
            timing_iters=args.timing_iters,
            methods=methods,
            figure_path=args.figure,
        )
        print(evaluate.write_report(args.out, results))
    else:
        if args.frames != 30:
            print("warning: --frames only applies with --tum; ignored", file=sys.stderr)
        evaluate.main(
            args.out,
            include_sp_methods=args.full,
            grid=grid,
            timing_iters=args.timing_iters,
            methods=methods,
            figure_path=args.figure,
        )
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="kinectdepthmapenhancement_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    en = sub.add_parser("enhance", help="run one pipeline on a depth+color frame")
    en.add_argument("--depth", required=True, help="cv::FileStorage XML depth file")
    en.add_argument("--depth-node", default="depth", help="matrix node name")
    en.add_argument("--color", required=True, help="color image (jpg/png)")
    en.add_argument(
        "--pipeline",
        default="kde",
        choices=["jbf", "mrf", "rgbf", "kde", "spdsp", "tof"],
    )
    en.add_argument("--out", required=True, help="output FileStorage XML path")
    en.add_argument("--ply", help="optional point-cloud PLY output")
    en.add_argument("--png", help="optional depth render PNG output")
    en.add_argument(
        "--debug-dir",
        help="write per-frame segmentation/labelImage/normals/depth renders "
        "(KDE only; the reference's always-on imwrite hooks, "
        "KinectDepthEnhancement.cpp:69,77, behind a flag)",
    )
    en.set_defaults(fn=_cmd_enhance)

    ev = sub.add_parser("evaluate", help="timing + accuracy harness (evaluation.txt)")
    ev.add_argument("out", help="output text file")
    ev.add_argument("--full", action="store_true", help="include SPDSP/TOF")
    ev.add_argument(
        "--tum",
        help="TUM RGB-D sequence dir: evaluate a real frame against the "
        "temporally-accumulated pseudo-GT (capture protocol, main.cpp:86-116)",
    )
    ev.add_argument(
        "--frames", type=int, default=30,
        help="frames folded into the pseudo-GT accumulator (with --tum)",
    )
    ev.add_argument("--grid", help="superpixel grid ROWSxCOLS override, e.g. 3x4")
    ev.add_argument(
        "--methods",
        help="comma-separated subset to run (with --tum), e.g. input,jbf,kde",
    )
    ev.add_argument(
        "--timing-iters", type=int, default=5, help="timed repetitions per method"
    )
    ev.add_argument(
        "--figure",
        help="write a side-by-side comparison PNG (input / GT / each method "
        "depth render — the reference's PCL 6-viewport view, main.cpp:362-413)",
    )
    ev.set_defaults(fn=_cmd_evaluate)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
