"""Composed-pipeline oracle parity (SURVEY.md §4c) + real-frame fixture.

The per-op oracles are composed into full CPU KDE / RGBF pipelines
(oracle_pipeline.py) and compared end-to-end against the jitted device
pipelines, covering the inter-stage contracts (units, sentinels, label
handoffs).  Tolerances: labels must be EXACT (integer handoffs); depths
accumulate f32-vs-f64 differences through 4+ filter stages, so value
comparisons use a small mm tolerance plus agreement-fraction asserts at the
few pixels where a gate flips on a f32 boundary.

The real-frame test drives the KDE pipeline with the reference's only
bundled real data (/root/reference/input/color.jpg, main.cpp:146-163), with
depth synthesized by the reference's own noise model (main.cpp:127-130) —
so at least one end-to-end run sees real image statistics."""

import dataclasses
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import golden
import oracle_pipeline
from kinectdepthmapenhancement_tpu.core.camera import (
    default_kinect_intrinsics,
    projective_to_real,
)
from kinectdepthmapenhancement_tpu.core.config import GridParams, KDEConfig, RGBFConfig
from kinectdepthmapenhancement_tpu.core.io import imread_rgb
from kinectdepthmapenhancement_tpu.core.testdata import make_noisy_scene
from kinectdepthmapenhancement_tpu.models import pipelines

REF_COLOR = "/root/reference/input/color.jpg"


def _scene(h=96, w=128, seed=0):
    intr = default_kinect_intrinsics(w, h)
    color, noisy, gt = make_noisy_scene(h, w, intr, seed=seed)
    return intr, color, noisy, gt, GridParams(rows=3, cols=4)


@pytest.mark.full
def test_kde_composed_oracle_parity():
    intr, color, noisy, gt, grid = _scene()
    cfg = dataclasses.replace(KDEConfig(), grid=grid)

    want = golden.cached(
        "kde_oracle_96x128_seed0",
        dict(
            depth=noisy.astype(np.float64), color=color, fx=intr.fx,
            fy=intr.fy, cx=intr.cx, cy=intr.cy, rows=grid.rows,
            cols=grid.cols, max_fit_residual=0.0025,
        ),
        lambda: {
            k: np.asarray(v)
            for k, v in oracle_pipeline.kde_oracle(
                noisy.astype(np.float64), color, intr.fx, intr.fy, intr.cx,
                intr.cy, rows=grid.rows, cols=grid.cols,
            ).items()
        },
    )
    res = jax.jit(
        lambda d, c: pipelines.kde_pipeline(d, c, intr, cfg)
    )(jnp.asarray(noisy), jnp.asarray(color))

    # stage 1: JBF depth — pure filter arithmetic, f32 vs f64 only
    np.testing.assert_allclose(
        np.asarray(res.jbf_depth), want["jbf"], rtol=2e-4, atol=0.25
    )

    # stage 2: normals agree in direction almost everywhere (the covariance
    # eigenvector is ill-conditioned exactly at depth edges)
    got_n = np.asarray(res.normals)
    wn = want["normals"]
    both_valid = (got_n != -1.0).any(-1) & (wn != -1.0).any(-1)
    dots = np.abs(np.sum(got_n * wn, axis=-1))
    valid_flags_match = ((got_n != -1.0).any(-1) == (wn != -1.0).any(-1))
    assert valid_flags_match.mean() > 0.995
    # pixels where BOTH sides degenerate to the zero vector (rest-normal
    # cross products with no valid neighbour) agree by construction
    both_zero = (np.linalg.norm(got_n, axis=-1) < 1e-6) & (
        np.linalg.norm(wn, axis=-1) < 1e-6
    )
    ok = both_zero | (dots > 0.999)
    assert ok[both_valid].mean() > 0.995

    # stage 3: NASP labels — the integer handoff must agree except at argmin
    # ties flipped by accumulated f32-vs-f64 input differences (per-op tests
    # prove label-exactness on IDENTICAL inputs; here the inputs drift)
    got_l = np.asarray(res.nasp_labels)
    assert (got_l == want["nasp_labels"]).mean() > 0.995

    # stage 4: merged labels — compare the PARTITION up to representative
    # naming, over pixels whose NASP labels agreed
    got_m = np.asarray(res.merged_labels)
    want_m = want["merged_labels"]
    stable = got_l == want["nasp_labels"]
    assert ((got_m < 0) == (want_m < 0))[stable].mean() > 0.995
    pairs = {}
    ok_pairs = total = 0
    for g, w_ in zip(got_m[stable].ravel(), want_m[stable].ravel()):
        if g >= 0 and w_ >= 0:
            total += 1
            ok_pairs += pairs.setdefault(g, w_) == w_
    assert total > 0 and ok_pairs / total > 0.995

    # stage 5: final optimized points — mm-level agreement end to end.
    # variance/size gates compare f32 vs f64 sums, so a boundary-straddling
    # pixel can take a different branch (worst case a 3%-of-z blend flip);
    # require 99% of pixels within 1 mm and a bounded 99.9th percentile.
    got_p = np.asarray(res.optimized_points)
    diff = np.abs(got_p - want["optimized_points"]).max(-1)
    assert (diff < 1.0).mean() > 0.99
    assert float(np.quantile(diff, 0.999)) < 120.0  # 3% of max scene depth


@pytest.mark.full
def test_kde_composed_oracle_parity_reference_exact():
    """VERDICT r3 #5: the documented claim that max_plane_residual=inf
    restores exact reference behaviour (Projection_GPU.cu:174-196 has no
    plane-confidence gate), tested END TO END: the composed pipeline and the
    composed oracle both run in reference mode and must still agree."""
    intr, color, noisy, gt, grid = _scene()
    cfg = dataclasses.replace(
        KDEConfig(), grid=grid, max_plane_residual=float("inf")
    )

    want = golden.cached(
        "kde_oracle_96x128_seed0_refexact",
        dict(
            depth=noisy.astype(np.float64), color=color, fx=intr.fx,
            fy=intr.fy, cx=intr.cx, cy=intr.cy, rows=grid.rows,
            cols=grid.cols, max_fit_residual=float("inf"),
        ),
        lambda: {
            k: np.asarray(v)
            for k, v in oracle_pipeline.kde_oracle(
                noisy.astype(np.float64), color, intr.fx, intr.fy, intr.cx,
                intr.cy, rows=grid.rows, cols=grid.cols,
                max_fit_residual=float("inf"),
            ).items()
        },
    )
    res = jax.jit(
        lambda d, c: pipelines.kde_pipeline(d, c, intr, cfg)
    )(jnp.asarray(noisy), jnp.asarray(color))

    got_l = np.asarray(res.nasp_labels)
    assert (got_l == want["nasp_labels"]).mean() > 0.995
    got_p = np.asarray(res.optimized_points)
    diff = np.abs(got_p - want["optimized_points"]).max(-1)
    assert (diff < 1.0).mean() > 0.99
    assert float(np.quantile(diff, 0.999)) < 120.0


@pytest.mark.full
def test_spdsp_reference_exact_mode_disables_gate():
    """SPDSPConfig.max_plane_residual=inf must reproduce the ungated
    reference path (every cluster plane trusted in the 20-sweep MRF stage):
    inf == an explicit all-true gate, pixel for pixel."""
    from kinectdepthmapenhancement_tpu.core.config import SPDSPConfig
    from kinectdepthmapenhancement_tpu.core.camera import normalized_rays
    from kinectdepthmapenhancement_tpu.ops import ers, plane, slic

    intr, color, noisy, gt, grid = _scene()
    cfg = dataclasses.replace(
        SPDSPConfig(), grid=grid, max_plane_residual=float("inf")
    )
    pts = projective_to_real(jnp.asarray(noisy), intr)
    res = jax.jit(
        lambda d, p, c: pipelines.spdsp_pipeline(d, p, c, intr, cfg)
    )(jnp.asarray(noisy), pts, jnp.asarray(color))

    # the ungated reference composition, from the same refined stages
    h, w = noisy.shape
    rays = normalized_rays(intr, h, w)
    rpoints = projective_to_real(res.refined_depth, intr)
    fitted = plane.set_pseudo_depth_cluster(
        rpoints, rays, res.planes_nd, res.refined_labels, strict=False
    )
    want = jax.jit(
        lambda rp, pf: plane.mrf_optimization(
            rp, pf, rays, cfg.projection, gate_mask=None
        )
    )(rpoints, fitted)
    # separate jit programs fuse differently -> last-ulp drift only
    np.testing.assert_allclose(
        np.asarray(res.optimized_points), np.asarray(want), rtol=0, atol=0.01
    )


@pytest.mark.full
def test_rgbf_composed_oracle_parity():
    intr, color, noisy, gt, grid = _scene()
    cfg = dataclasses.replace(RGBFConfig(), grid=grid)

    want = golden.cached(
        "rgbf_oracle_96x128_seed0",
        dict(
            depth=noisy.astype(np.float64), color=color, fx=intr.fx,
            fy=intr.fy, cx=intr.cx, cy=intr.cy, rows=grid.rows,
            cols=grid.cols,
        ),
        lambda: {
            k: np.asarray(v)
            for k, v in oracle_pipeline.rgbf_oracle(
                noisy.astype(np.float64), color, intr.fx, intr.fy, intr.cx,
                intr.cy, rows=grid.rows, cols=grid.cols,
            ).items()
        },
    )
    pts = projective_to_real(jnp.asarray(noisy), intr)
    res = jax.jit(
        lambda d, p, c: pipelines.rgbf_pipeline(d, p, c, cfg)
    )(jnp.asarray(noisy), pts, jnp.asarray(color))

    # colour-SLIC sees bit-identical inputs (sd=0: no depth term) -> exact;
    # depth-SLIC sees f32-vs-f64 points -> allow argmin-tie flips
    np.testing.assert_array_equal(np.asarray(res.color_labels), want["color_labels"])
    assert (np.asarray(res.depth_labels) == want["depth_labels"]).mean() > 0.995
    assert (np.asarray(res.refined_labels) == want["refined_labels"]).mean() > 0.99
    got_d = np.asarray(res.refined_depth)
    dd = np.abs(got_d - want["refined_depth"])
    assert (dd < 0.5).mean() > 0.99           # f32-vs-f64 filter arithmetic
    assert float(np.quantile(dd, 0.999)) < 400.0  # zeroing-command flips


@pytest.mark.full
def test_kde_beats_jbf_on_far_range_banding():
    """VERDICT r3 #4: the comparison the reference exists to win.  On
    far-range (3-5.5 m) Kinect-v1 data the quantization bands are many
    pixels wide, so per-pixel filtering (JBF) cannot see across a band to
    recover the true surface.  Gate: KDE RMSE < 90% of JBF RMSE (measured:
    ~5.7 vs ~8.2 mm; EVAL_FAR.md).

    Round-5 attribution correction: with the DEFAULT config the margin
    comes from KDE's final depth bilateral, NOT the plane projection — the
    normal-similarity merge over-merges here (quantization-biased normals)
    and the plane-confidence gate correctly disables the projection for
    every cluster (output is bitwise-identical with the gate forced shut;
    EVAL_FAR.md round 5).  The projection only fires with the round-5
    plane-consistency merge (cfg.plane_merge), gated below: it must beat
    the default-config KDE, and the dominant component's interior must land
    within ~1 mm-scale of the true plane where the input is banded at
    ~8 mm RMSE."""
    import dataclasses

    from kinectdepthmapenhancement_tpu.core.testdata import make_banded_scene

    h, w = 480, 640
    intr = default_kinect_intrinsics(w, h)
    color, sensor, gt = make_banded_scene(h, w, intr, seed=0)
    d, c = jnp.asarray(sensor), jnp.asarray(color)

    jbf = np.asarray(jax.jit(lambda a, b: pipelines.jbf_pipeline(a, b))(d, c))
    res = jax.jit(
        lambda a, b: pipelines.kde_pipeline(a, b, intr, KDEConfig())
    )(d, c)
    zk = np.asarray(res.optimized_points[..., 2])

    vj = jbf > 50.0
    vk = zk > 50.0
    rm_jbf = float(np.sqrt(np.mean((jbf[vj] - gt[vj]) ** 2)))
    rm_kde = float(np.sqrt(np.mean((zk[vk] - gt[vk]) ** 2)))
    assert vk.mean() > 0.99 and vj.mean() > 0.99
    assert rm_kde < rm_jbf * 0.9, (rm_kde, rm_jbf)

    # ---- plane-consistency merge: the projection stage actually fires
    pm_cfg = dataclasses.replace(KDEConfig(), plane_merge=True)
    res_pm = jax.jit(
        lambda a, b: pipelines.kde_pipeline(a, b, intr, pm_cfg)
    )(d, c)
    zp = np.asarray(res_pm.optimized_points[..., 2])
    vp = zp > 50.0
    rm_pm = float(np.sqrt(np.mean((zp[vp] - gt[vp]) ** 2)))
    assert rm_pm < rm_kde * 0.98, (rm_pm, rm_kde)  # measured ~5.33 vs 5.67
    # dominant merged component (the back wall) must be recovered to the
    # sub-band level on its interior
    lab = np.asarray(res_pm.merged_labels)
    sizes = np.bincount(lab[lab >= 0], minlength=KDEConfig().grid.num_clusters)
    big = int(np.argmax(sizes))
    mwall = (lab == big) & vp
    assert sizes[big] > 100_000
    rm_wall = float(np.sqrt(np.mean((zp[mwall] - gt[mwall]) ** 2)))
    assert rm_wall < 1.5, rm_wall  # measured 0.58 mm vs ~8 mm banded input


@pytest.mark.full
@pytest.mark.skipif(not os.path.exists(REF_COLOR), reason="reference frame absent")
def test_kde_on_reference_frame():
    """KDE over the bundled real colour frame (main.cpp:146-163) at its
    native 640x480, with depth synthesized by the reference noise model
    (main.cpp:127-130) over the procedural geometry: real image statistics
    must not break the pipeline, and it must still reduce depth error.
    (Runs at full res because the pipeline constants — min cluster 1300 px,
    sigma sets — are tuned for 640x480; small crops over-merge by design.)"""
    color = imread_rgb(REF_COLOR)  # 480x640 RGB
    h, w = color.shape[:2]
    intr = default_kinect_intrinsics(w, h)
    # depth ground truth: piecewise fronto-parallel planes whose boundaries
    # follow the REAL image's contours (quantized smoothed luminance), so the
    # guided stages see consistent colour/depth edges like a registered
    # Kinect frame would; noise per the reference model (main.cpp:127-130)
    lum = np.asarray(color, np.float32).mean(-1)
    k = np.ones((9, 9), np.float32) / 81.0
    lum_s = np.asarray(
        jax.scipy.signal.convolve2d(jnp.asarray(lum), jnp.asarray(k), mode="same")
    )
    bands = np.digitize(lum_s, np.quantile(lum_s, [0.2, 0.4, 0.6, 0.8]))
    gt = np.take(
        np.array([1500.0, 1900.0, 2400.0, 3000.0, 3600.0], np.float32), bands
    )
    rng = np.random.default_rng(11)
    variance = 0.45 * 2.85 * np.square(gt / 10.0) / 1.0e4
    noisy = (gt + rng.uniform(-1.0, 1.0, gt.shape) * variance).astype(np.float32)
    cfg = KDEConfig()
    res = jax.jit(lambda d, c: pipelines.kde_pipeline(d, c, intr, cfg))(
        jnp.asarray(noisy), jnp.asarray(color)
    )
    assert np.isfinite(np.asarray(res.optimized_points)).all()
    lab = np.asarray(res.nasp_labels)
    assert lab.min() >= -1 and lab.max() < cfg.grid.num_clusters

    # quality contract on real statistics: away from GT depth edges the
    # pipeline must denoise (the luminance-quantile fixture necessarily puts
    # some depth edges in LOW-contrast image regions — mid-gradient level
    # sets — where no cross-bilateral filter can localise the edge, so edge
    # bands are excluded; a real registered frame has no such pixels)
    gy, gx = np.gradient(gt)
    edge = (np.abs(gy) + np.abs(gx)) > 1.0
    interior = ~edge
    for _ in range(3):  # dilate the edge band by 3 px
        e = interior
        interior = (
            e
            & np.roll(e, 1, 0) & np.roll(e, -1, 0)
            & np.roll(e, 1, 1) & np.roll(e, -1, 1)
        )
    zo = np.asarray(res.optimized_points[..., 2])
    rm_in = np.sqrt(np.mean((noisy - gt)[interior] ** 2))
    rm_out = np.sqrt(np.mean((zo - gt)[interior] ** 2))
    assert interior.mean() > 0.5
    assert rm_out < rm_in * 0.6  # >=40% interior noise reduction
