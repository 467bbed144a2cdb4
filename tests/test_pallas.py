"""Pallas kernels vs their XLA reference paths (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kinectdepthmapenhancement_tpu.core.config import JBFParams, NormalParams
from kinectdepthmapenhancement_tpu.ops import bilateral
from kinectdepthmapenhancement_tpu.ops.pallas_bilateral import jbf_pallas


def test_jbf_pallas_matches_xla(small_scene):
    color = small_scene["color"]
    depth = small_scene["depth"]
    p = JBFParams()
    guide = bilateral.guide_bilateral(jnp.asarray(color), p).astype(jnp.float32)
    want = np.asarray(
        bilateral._jbf_core(
            jnp.asarray(depth), guide,
            window=p.window, spatial_sigma=p.spatial_sigma,
            color_sigma=p.color_sigma, depth_sigma=p.depth_sigma,
        )
    )
    got = np.asarray(
        jbf_pallas(jnp.asarray(depth), guide, p, tile=48, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=5e-3)


def test_cov_pallas_matches_xla(small_scene):
    """Interpret-mode parity of the fused covariance kernel vs the XLA direct
    sweep (identical arithmetic and tap order, so tolerances are tiny)."""
    import jax.numpy as jnp
    from kinectdepthmapenhancement_tpu.core.camera import (
        default_kinect_intrinsics,
        projective_to_real,
    )
    from kinectdepthmapenhancement_tpu.ops import normals
    from kinectdepthmapenhancement_tpu.ops.pallas_cov import cm_covariances

    h, w = small_scene["depth"].shape
    intr = small_scene["intr"]
    pts = projective_to_real(jnp.asarray(small_scene["depth"]), intr) / 1000.0
    smooth = normals.smoothing_map(pts, NormalParams())
    rect = smooth.astype(jnp.int32)

    want = np.asarray(
        normals.cm_normals(pts, smooth, 20, cov_impl="xla")
    )
    # route the pallas path through interpret mode by monkey-free direct call:
    cnt_p, cov_p = cm_covariances(pts, rect, interpret=True)
    # rebuild normals from the pallas covariances exactly as cm_normals does.
    # On a real TPU the kernel is bit-exact vs the XLA path (verified at
    # 640x480); interpret mode on CPU contracts fma differently, so near-
    # degenerate eigenvectors wiggle by ~1e-4 on a handful of pixels.
    got = np.asarray(_normals_from_cov(pts, smooth, 20, cnt_p, cov_p))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


def _normals_from_cov(vm, smoothing, border, cont, ent):
    """Tail of ops.normals.cm_normals after the covariance sweep."""
    import jax.numpy as jnp
    from kinectdepthmapenhancement_tpu.ops import normals as N

    h, w = smoothing.shape
    v = jnp.broadcast_to(jnp.arange(h)[:, None], (h, w))
    u = jnp.broadcast_to(jnp.arange(w)[None, :], (h, w))
    in_border = (u <= border) | (u >= w - border) | (v <= border) | (v >= h - border)
    c_xx, c_xy, c_xz = ent[..., 0], ent[..., 1], ent[..., 2]
    c_yy, c_yz, c_zz = ent[..., 3], ent[..., 4], ent[..., 5]
    cov = jnp.stack(
        [
            jnp.stack([c_xx, c_xy, c_xz], -1),
            jnp.stack([c_xy, c_yy, c_yz], -1),
            jnp.stack([c_xz, c_yz, c_zz], -1),
        ],
        axis=-2,
    )
    _, vec = N.smallest_eigenvector(cov)
    ez_neg = vec[..., 2] < 0.0
    stored = jnp.where(
        ez_neg[..., None],
        vec * jnp.array([1.0, -1.0, 1.0], vec.dtype),
        vec * jnp.array([-1.0, 1.0, -1.0], vec.dtype),
    )
    bad = in_border | (smoothing <= 2.0) | (cont == 0)
    return jnp.where(bad[..., None], N.BAD, stored)


def test_cov_pallas_batched_grid_matches_single(small_scene):
    """The natively batched grid (what the custom_vmap rule dispatches to)
    equals per-slice single calls, in interpret mode."""
    import jax.numpy as jnp
    from kinectdepthmapenhancement_tpu.ops import pallas_cov

    rng = np.random.default_rng(7)
    v = rng.uniform(-1.0, 3.0, (2, 64, 96, 3)).astype(np.float32)
    v[..., 2] = np.where(rng.random((2, 64, 96)) < 0.05, 0.0, v[..., 2])
    r = rng.integers(0, 25, (2, 64, 96)).astype(np.int32)
    vj, rj = jnp.asarray(v), jnp.asarray(r)
    bc, be = pallas_cov._cm_covariances_batched(vj, rj, tile=32, interpret=True)
    for b in range(2):
        sc, se = pallas_cov._cm_covariances_batched(
            vj[b : b + 1], rj[b : b + 1], tile=32, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(bc[b]), np.asarray(sc[0]))
        np.testing.assert_array_equal(np.asarray(be[b]), np.asarray(se[0]))


def test_jbf_pallas_nondivisible_height(small_scene):
    """Direct kernel call on a padded height slices back to the original."""
    color = small_scene["color"][:50, :]
    depth = small_scene["depth"][:50, :]
    p = JBFParams()
    guide = bilateral.guide_bilateral(jnp.asarray(color), p).astype(jnp.float32)
    dpad = jnp.pad(jnp.asarray(depth), ((0, 46), (0, 0)))
    gpad = jnp.pad(guide, ((0, 46), (0, 0), (0, 0)))
    out = jbf_pallas(dpad, gpad, p, tile=48, interpret=True)[:50]
    want = np.asarray(
        bilateral._jbf_core(
            jnp.asarray(depth), guide,
            window=p.window, spatial_sigma=p.spatial_sigma,
            color_sigma=p.color_sigma, depth_sigma=p.depth_sigma,
        )
    )
    # rows near the pad boundary see zero-padding exactly like the reference's
    # bounds test, so the interior matches
    np.testing.assert_allclose(np.asarray(out)[:48], want[:48], rtol=1e-5, atol=5e-3)


def test_seed_gradient_pallas_matches_xla_color():
    """pallas_gradient.seed_gradient (interpret mode) == slic._color_gradient
    bitwise, including edge clamping and the count>0 inf fill."""
    from kinectdepthmapenhancement_tpu.ops import pallas_gradient, slic

    rng = np.random.default_rng(3)
    h, w = 54, 70
    color_f = rng.integers(0, 255, (h, w, 3)).astype(np.float32)
    # a constant patch exercises the g==0 -> count exclusion path
    color_f[10:20, 10:20] = 128.0
    want = np.asarray(jax.jit(slic._color_gradient)(jnp.asarray(color_f)))
    got = np.asarray(
        pallas_gradient.seed_gradient(jnp.asarray(color_f), interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_seed_gradient_pallas_matches_xla_nasp():
    from kinectdepthmapenhancement_tpu.ops import pallas_gradient, slic

    rng = np.random.default_rng(4)
    h, w = 36, 130  # > 128 lanes: exercises the roll wrap margin
    color_f = rng.integers(0, 255, (h, w, 3)).astype(np.float32)
    n = rng.normal(size=(h, w, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n[rng.random((h, w)) < 0.15] = -1.0  # invalid normals
    want = np.asarray(
        jax.jit(slic._nasp_gradient)(jnp.asarray(color_f), jnp.asarray(n))
    )
    got = np.asarray(
        pallas_gradient.seed_gradient(
            jnp.asarray(color_f), jnp.asarray(n), interpret=True
        )
    )
    np.testing.assert_array_equal(got, want)


def _nasp_state(h=96, w=128, rows=3, cols=4, seed=9):
    """Labels + features in the post-first-assignment regime the cell index
    requires: every label from its pixel's 8x8 cell neighbourhood or -1."""
    from kinectdepthmapenhancement_tpu.core.config import GridParams

    rng = np.random.default_rng(seed)
    grid = GridParams(rows=rows, cols=cols)
    r = 4
    cy = np.arange(h)[:, None] // (h // rows)
    cx = np.arange(w)[None, :] // (w // cols)
    dy = rng.integers(-r, r, (h, w))
    dx = rng.integers(-r, r, (h, w))
    ny = np.clip(cy + dy, 0, rows - 1)
    nx = np.clip(cx + dx, 0, cols - 1)
    labels = (ny * cols + nx).astype(np.int32)
    labels[rng.random((h, w)) < 0.07] = -1
    color_f = rng.integers(0, 255, (h, w, 3)).astype(np.float32)
    points = rng.uniform(100.0, 4000.0, (h, w, 3)).astype(np.float32)
    points[rng.random((h, w)) < 0.1] = 0.0
    normals = rng.normal(size=(h, w, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    normals[rng.random((h, w)) < 0.15] = -1.0
    return grid, labels, color_f, points, normals


@pytest.mark.parametrize("mode", ["analyze", "weighted"])
def test_nasp_cell_sums_pallas_matches_xla(mode):
    """ops/pallas_nasp.py (interpret) == the _CellIndex one-hot-matmul route
    for both stats sweeps, on adversarial labels (invalids, window misses)."""
    import dataclasses

    from kinectdepthmapenhancement_tpu.core.config import SLICParams
    from kinectdepthmapenhancement_tpu.ops import slic

    grid, labels, color_f, points, normals = _nasp_state()
    h, w = labels.shape
    params = SLICParams(10.0, 50.0, 50.0, 150.0, 1)
    rng = np.random.default_rng(1)
    k = grid.num_clusters
    clusters = slic.Clusters(
        rgb=jnp.asarray(rng.integers(0, 255, (k, 3)).astype(np.float32)),
        xy=jnp.asarray(
            np.stack(
                [rng.integers(0, w, k), rng.integers(0, h, k)], -1
            ).astype(np.int32)
        ),
        size=jnp.zeros((k,), jnp.int32),
        center=jnp.asarray(rng.uniform(100, 4000, (k, 3)).astype(np.float32)),
        normal=jnp.asarray(
            rng.normal(size=(k, 3)).astype(np.float32)
        ),
        variance=jnp.zeros((k,), jnp.float32),
    )
    idx = slic._CellIndex(jnp.asarray(labels), grid, 4, h, w)
    window_range = (-24, 23)

    slic.tables.force_mode("mxu")
    try:
        update = (
            slic._update_nasp_analyze
            if mode == "analyze"
            else slic._update_nasp_weighted
        )
        want = update(
            idx, jnp.asarray(labels), clusters, jnp.asarray(color_f),
            jnp.asarray(points), jnp.asarray(normals), grid,
            dataclasses.replace(params, stats_impl="xla"), window_range, h, w,
        )
        got = update(
            idx, jnp.asarray(labels), clusters, jnp.asarray(color_f),
            jnp.asarray(points), jnp.asarray(normals), grid,
            dataclasses.replace(params, stats_impl="pallas"), window_range, h, w,
        )
    finally:
        slic.tables.force_mode(None)

    for name in ("rgb", "xy", "size", "center", "normal", "variance"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(want, name)),
            rtol=2e-5,
            atol=2e-3,
            err_msg=f"{mode}.{name}",
        )


def test_nasp_fused_assign_analyze_matches_xla():
    """The fully fused first iteration (assignment + analyze + weighted via
    ops/pallas_nasp.py, interpret mode) vs the XLA band-space route through
    the public segment() API: labels EXACT, cluster stats close."""
    import dataclasses

    from kinectdepthmapenhancement_tpu.core.camera import (
        default_kinect_intrinsics,
        projective_to_real,
    )
    from kinectdepthmapenhancement_tpu.core.config import GridParams, SLICParams
    from kinectdepthmapenhancement_tpu.core.testdata import make_noisy_scene
    from kinectdepthmapenhancement_tpu.ops import normals as normals_mod
    from kinectdepthmapenhancement_tpu.ops import slic

    h, w = 96, 128
    intr = default_kinect_intrinsics(w, h)
    color, noisy, _ = make_noisy_scene(h, w, intr, seed=5)
    pts = projective_to_real(jnp.asarray(noisy), intr)
    nmap = normals_mod.generate_normal_map(pts)
    grid = GridParams(rows=3, cols=4)
    params = SLICParams(10.0, 50.0, 50.0, 150.0, 1)
    rng = np.random.default_rng(2)
    seeds = np.stack(
        [rng.integers(0, w, grid.num_clusters), rng.integers(0, h, grid.num_clusters)],
        axis=-1,
    ).astype(np.int32)

    slic.force_cell(True)
    slic.tables.force_mode("mxu")
    try:
        want = slic.segment(
            jnp.asarray(color), pts, nmap, grid=grid,
            params=dataclasses.replace(params, stats_impl="xla"),
            variant="nasp", seeds=seeds,
        )
        got = slic.segment(
            jnp.asarray(color), pts, nmap, grid=grid,
            params=dataclasses.replace(params, stats_impl="pallas"),
            variant="nasp", seeds=seeds,
        )
    finally:
        slic.force_cell(None)
        slic.tables.force_mode(None)

    np.testing.assert_array_equal(
        np.asarray(got.labels), np.asarray(want.labels)
    )
    np.testing.assert_allclose(
        np.asarray(got.distance), np.asarray(want.distance), rtol=1e-6, atol=1e-2
    )
    for name in ("rgb", "xy", "size", "center", "normal", "variance"):
        np.testing.assert_allclose(
            np.asarray(getattr(got.clusters, name)),
            np.asarray(getattr(want.clusters, name)),
            rtol=2e-5,
            atol=2e-3,
            err_msg=name,
        )


def test_label_cell_sums_kernel_matches_matmul_route():
    """ops/pallas_nasp.py::label_cell_sums (interpret) == the cell-space
    one-hot matmul segment_sum, through _CellIndex with kernel_sums toggled."""
    from kinectdepthmapenhancement_tpu.ops import slic

    grid, labels, color_f, points, normals = _nasp_state(seed=11)
    h, w = labels.shape
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(h, w, 2)).astype(np.float32)
    mask = rng.random((h, w)) < 0.8

    slic.tables.force_mode("mxu")
    try:
        idx_x = slic._CellIndex(
            jnp.asarray(labels), grid, 4, h, w, kernel_sums=False
        )
        idx_k = slic._CellIndex(
            jnp.asarray(labels), grid, 4, h, w, kernel_sums=True
        )
        want = idx_x.segment_sum(jnp.asarray(feats), jnp.asarray(mask))
        got = idx_k.segment_sum(jnp.asarray(feats), jnp.asarray(mask))
    finally:
        slic.tables.force_mode(None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-3
    )


def test_dt_pallas_matches_xla():
    """ops/pallas_dt.py (interpret) == the XLA min-plus relaxation, bitwise
    (min and + are exact in f32 and min is order-insensitive)."""
    from kinectdepthmapenhancement_tpu.ops import normals as nm
    from kinectdepthmapenhancement_tpu.ops import pallas_dt

    rng = np.random.default_rng(6)
    h, w = 60, 130  # non-multiple of 128: exercises the lane pad masks
    dci = np.where(rng.random((h, w)) < 0.03, 0, 255).astype(np.int32)
    dci[0, -1] = 0  # corner sources exercise the border masks
    dci[-1, 0] = 0
    want = np.asarray(
        jax.jit(lambda d: nm.distance_transform(d, 26))(jnp.asarray(dci))
    )
    got = np.asarray(
        pallas_dt.distance_transform(jnp.asarray(dci), 26, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_label_cell_gather_kernel_matches_matmul_route():
    """ops/pallas_nasp.py::label_cell_gather (interpret) == the cell-space
    matmul gather, exactly (both are pure selections)."""
    from kinectdepthmapenhancement_tpu.ops import slic

    grid, labels, color_f, points, normals = _nasp_state(seed=13)
    h, w = labels.shape
    rng = np.random.default_rng(5)
    table = rng.normal(size=(grid.num_clusters, 5)).astype(np.float32)

    slic.tables.force_mode("mxu")
    try:
        idx_x = slic._CellIndex(
            jnp.asarray(labels), grid, 4, h, w, kernel_sums=False
        )
        idx_k = slic._CellIndex(
            jnp.asarray(labels), grid, 4, h, w, kernel_sums=True
        )
        want = idx_x.gather(jnp.asarray(table))
        got = idx_k.gather(jnp.asarray(table))
    finally:
        slic.tables.force_mode(None)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
