"""Composed CPU pipeline oracles (SURVEY.md §4c).

Full transliterations of the reference's KDE (KinectDepthEnhancement.cpp:56-81)
and RGBF (RegionGrowingBilateralFilter.cpp:27-38) Process() chains built ONLY
from the per-op oracles in this directory, so an end-to-end comparison covers
the inter-stage contracts (units, sentinels, label handoffs) that per-op tests
can't see.  Every fidelity decision matches the documented spec in the ops
modules (underflow guards fixed, deterministic ERS, converged CCL)."""

from __future__ import annotations

import numpy as np

import oracle as o_bilateral
import oracle_ccl
import oracle_ers
import oracle_normals
import oracle_plane
import oracle_slic


def kde_oracle(
    depth, color, fx, fy, cx, cy, rows=15, cols=20,
    max_fit_residual=0.0025,
):
    """KinectDepthEnhancement::Process: JBF -> projectiveToReal -> CM normals
    -> NASP(10,50,50,150, iter=1) -> CCL merge -> setPsuedoDepth +
    variance_optimization + depth bilateral.  Returns a dict of every stage
    output (mm).

    max_fit_residual: the plane-confidence gate threshold (spec extension,
    core/config.py); float('inf') reproduces the reference exactly
    (Projection_GPU.cu:188-211 has no such gate)."""
    h, w = depth.shape

    guide = o_bilateral.guide_bilateral(color)
    jbf = o_bilateral.joint_bilateral_filter(depth, guide)
    points = o_bilateral.projective_to_real(jbf, fx, fy, cx, cy)

    nmap = oracle_normals.generate(points, method="cm", size=20.0, mdc=0.05)

    nasp = oracle_slic.slic_segment(
        color, points, nmap, rows, cols,
        sc=10.0, ss=50.0, sd=50.0, sn=150.0, iters=1, variant="nasp",
    )

    merged = oracle_ccl.merge_normals(
        nasp["labels"], nasp["normal"], nasp["center"]
    )

    rays = oracle_plane.normalized_rays(fx, fy, cx, cy, h, w)
    plane_fitted = oracle_plane.set_pseudo_depth_map(
        points, rays, merged["nd_map"], merged["labels"], merged["variance"]
    )
    resid = oracle_plane.plane_fit_residual(
        points, plane_fitted, merged["labels"], rows * cols
    )
    opt = oracle_plane.variance_optimization(
        points, plane_fitted, merged["labels"], merged["variance"], merged["sizes"],
        fit_residual=resid, max_fit_residual=max_fit_residual,
    )
    final = oracle_plane.depth_bilateral(opt, rays)
    return {
        "jbf": jbf,
        "points": points,
        "normals": nmap,
        "nasp_labels": nasp["labels"],
        "merged_labels": merged["labels"],
        "merged_variance": merged["variance"],
        "plane_fitted": plane_fitted,
        "optimized_points": final,
    }


def rgbf_oracle(depth, color, fx, fy, cx, cy, rows=15, cols=20):
    """RegionGrowingBilateralFilter::Process: colour-DASP(200,40) +
    depth-DASP(100,20,200), 1 iter each -> ERS edge refine + enhance."""
    points = o_bilateral.projective_to_real(depth, fx, fy, cx, cy)
    sp = oracle_slic.slic_segment(
        color, points, None, rows, cols,
        sc=200.0, ss=40.0, sd=0.0, sn=0.0, iters=1, variant="dasp",
    )
    dasp = oracle_slic.slic_segment(
        color, points, None, rows, cols,
        sc=100.0, ss=20.0, sd=200.0, sn=0.0, iters=1, variant="dasp",
    )
    labels, rdepth = oracle_ers.edge_refine(sp["labels"], dasp["labels"], depth)
    enhanced = oracle_ers.depth_enhance(rdepth, labels, color)
    return {
        "color_labels": sp["labels"],
        "depth_labels": dasp["labels"],
        "refined_labels": labels,
        "refined_depth": enhanced,
    }
