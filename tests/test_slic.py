import numpy as np
import jax.numpy as jnp

from kinectdepthmapenhancement_tpu.core.camera import projective_to_real
from kinectdepthmapenhancement_tpu.core.config import GridParams, SLICParams
from kinectdepthmapenhancement_tpu.ops import slic

import oracle_slic


def _setup(small_scene, h=48, w=64):
    color = small_scene["color"][:h, :w]
    depth = small_scene["depth"][:h, :w]
    intr = small_scene["intr"]
    points = np.asarray(projective_to_real(jnp.asarray(depth), intr))
    # synthetic piecewise normals with some invalids, unit length
    n = np.zeros((h, w, 3), np.float32)
    n[..., 2] = -1.0
    # NOT (-0.6, -0.8): that vector's f32 norm is 1 + 1ulp, which puts the
    # weighted-pass acceptance gate `dot <= 1.0` exactly on the f32/f64
    # rounding boundary (the f32 impl matches the reference's acosf(dot)
    # behaviour; the f64 oracle flips).  Use a clearly sub-unit normal.
    n[h // 2 :, :, 1] = -0.599
    n[h // 2 :, :, 2] = -0.7987
    n[depth <= 50.0] = -1.0
    return color, depth, points.astype(np.float32), n


def _compare(got: slic.SLICResult, want, *, check_normals=False):
    np.testing.assert_array_equal(np.asarray(got.labels), want["labels"])
    np.testing.assert_allclose(np.asarray(got.clusters.rgb), want["rgb"], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.clusters.xy), want["xy"])
    np.testing.assert_allclose(
        np.asarray(got.clusters.center), want["center"], rtol=1e-4, atol=0.05
    )
    if check_normals:
        np.testing.assert_allclose(
            np.asarray(got.clusters.normal), want["normal"], rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got.clusters.variance), want["variance"], rtol=1e-4, atol=1e-5
        )


def test_sp_matches_oracle(small_scene):
    color, depth, points, _ = _setup(small_scene)
    grid = GridParams(rows=3, cols=4)
    p = SLICParams(200.0, 40.0, 0.0, 0.0, 2)
    got = slic.segment(jnp.asarray(color), None, None, grid=grid, params=p, variant="sp")
    want = oracle_slic.slic_segment(
        color, None, None, 3, 4, 200.0, 40.0, 0.0, 0.0, 2, "sp"
    )
    _compare(got, want)


def test_dasp_matches_oracle(small_scene):
    color, depth, points, _ = _setup(small_scene)
    grid = GridParams(rows=3, cols=4)
    p = SLICParams(100.0, 20.0, 200.0, 0.0, 2)
    got = slic.segment(
        jnp.asarray(color), jnp.asarray(points), None, grid=grid, params=p, variant="dasp"
    )
    want = oracle_slic.slic_segment(
        color, points, None, 3, 4, 100.0, 20.0, 200.0, 0.0, 2, "dasp"
    )
    _compare(got, want)
    # invalid depth pixels must carry label -1 when depth_sigma != 0
    assert np.all(np.asarray(got.labels)[depth < 50.0] == -1)


def test_dasp_sigma0_acts_as_color_slic(small_scene):
    """With depth_sigma=0 (the 'SP' role in RGBF/SPDSP) no -1 labels appear."""
    color, depth, points, _ = _setup(small_scene)
    grid = GridParams(rows=3, cols=4)
    p = SLICParams(200.0, 10.0, 0.0, 0.0, 1)
    got = slic.segment(
        jnp.asarray(color), jnp.asarray(points), None, grid=grid, params=p, variant="dasp"
    )
    assert np.all(np.asarray(got.labels) >= 0)


def test_nasp_matches_oracle(small_scene):
    """NASP vs oracle with injected oracle seeds: the seed gradient has
    frequent near-ties (normal weighting zeroes many terms) whose argmin
    winner depends on f32 vs f64 rounding, so seeds are pinned and everything
    downstream is compared."""
    color, depth, points, normals = _setup(small_scene)
    grid = GridParams(rows=3, cols=4)
    p = SLICParams(10.0, 50.0, 50.0, 150.0, 2)
    want = oracle_slic.slic_segment(
        color, points, normals, 3, 4, 10.0, 50.0, 50.0, 150.0, 2, "nasp"
    )
    got = slic.segment(
        jnp.asarray(color),
        jnp.asarray(points),
        jnp.asarray(normals),
        grid=grid,
        params=p,
        variant="nasp",
        seeds=jnp.asarray(want["seeds"]),
    )
    _compare(got, want, check_normals=True)


def test_seed_sampling_matches_oracle_separated_gradient(small_scene):
    """On a gradient with well-separated values the argmin seed choice is
    deterministic and must match the oracle exactly."""
    import oracle_slic as osl

    h, w = 48, 64
    rng = np.random.default_rng(7)
    grad = rng.permutation(h * w).astype(np.float64).reshape(h, w)
    got = np.asarray(
        slic.sample_seeds(jnp.asarray(grad, jnp.float32), GridParams(3, 4), h, w, 8)
    )
    want = osl._seeds(grad, 3, 4, h, w, 8)
    np.testing.assert_array_equal(got, want)


def test_labels_cover_grid(small_scene):
    color, depth, points, _ = _setup(small_scene)
    grid = GridParams(rows=3, cols=4)
    p = SLICParams(100.0, 20.0, 200.0, 0.0, 1)
    got = slic.segment(
        jnp.asarray(color), jnp.asarray(points), None, grid=grid, params=p, variant="dasp"
    )
    lab = np.asarray(got.labels)
    assert lab.max() < 12 and lab.min() >= -1


def test_cell_index_matches_reference_path(small_scene):
    """The cell-local fast path (first-iteration broadcast assignment +
    cell-local one-hot updates) must reproduce the reference path exactly
    (labels) / to float tolerance (stats).

    Normals are perturbed off the piecewise-constant test scene: with
    constant normals the weighted update's `dot <= 1.0` acceptance gate sits
    exactly ON the f32 boundary and ANY summation-order change (the
    reference's own tree reduction included) flips it — a knife-edge the
    spec does not define tighter than float associativity."""
    color, depth, points, normals = _setup(small_scene)
    rng = np.random.default_rng(11)
    perturbed = normals + rng.normal(0, 0.02, normals.shape).astype(np.float32)
    valid = np.any(normals != -1.0, axis=-1)
    perturbed /= np.maximum(np.linalg.norm(perturbed, axis=-1, keepdims=True), 1e-9)
    normals = np.where(valid[..., None], perturbed, normals).astype(np.float32)
    grid = GridParams(rows=3, cols=4)
    p = SLICParams(10.0, 50.0, 50.0, 150.0, 2)
    seeds = oracle_slic.slic_segment(
        color, points, normals, 3, 4, 10.0, 50.0, 50.0, 150.0, 2, "nasp"
    )["seeds"]
    args = dict(grid=grid, params=p, variant="nasp", seeds=jnp.asarray(seeds))
    try:
        slic.force_cell(False)
        base = slic.segment(
            jnp.asarray(color), jnp.asarray(points), jnp.asarray(normals), **args
        )
        slic.force_cell(True)
        fast = slic.segment(
            jnp.asarray(color), jnp.asarray(points), jnp.asarray(normals), **args
        )
    finally:
        slic.force_cell(None)
    np.testing.assert_array_equal(np.asarray(fast.labels), np.asarray(base.labels))
    np.testing.assert_array_equal(np.asarray(fast.clusters.xy), np.asarray(base.clusters.xy))
    np.testing.assert_allclose(
        np.asarray(fast.clusters.rgb), np.asarray(base.clusters.rgb), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(fast.clusters.center), np.asarray(base.clusters.center),
        rtol=1e-5, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(fast.clusters.normal), np.asarray(base.clusters.normal),
        rtol=1e-5, atol=1e-5,
    )


def test_capped_cell_route_matches_global_5_iterations(small_scene):
    """SPDSP/TOF's 5-iteration DASP: the capped cell-space route for
    iterations 2+ (band-space assignment over the enlarged offset set with
    per-pixel window masks + capped _CellIndex updates, ops/slic.py) must be
    BITWISE equal to the global [H*W, K]-one-hot route — labels exactly,
    stats to float tolerance (summation order differs)."""
    color, depth, points, _ = _setup(small_scene)
    grid = GridParams(rows=3, cols=4)
    for sigmas in ((200.0, 10.0, 0.0, 0.0), (0.0, 10.0, 200.0, 0.0)):
        p = SLICParams(*sigmas, iterations=5)
        try:
            slic.force_cell(False)
            base = slic.segment(
                jnp.asarray(color), jnp.asarray(points), None,
                grid=grid, params=p, variant="dasp",
            )
            slic.force_cell(True)
            for locality in ("auto", "cell"):
                pl = SLICParams(*sigmas, iterations=5, locality=locality)
                fast = slic.segment(
                    jnp.asarray(color), jnp.asarray(points), None,
                    grid=grid, params=pl, variant="dasp",
                )
                np.testing.assert_array_equal(
                    np.asarray(fast.labels), np.asarray(base.labels)
                )
                np.testing.assert_array_equal(
                    np.asarray(fast.clusters.xy), np.asarray(base.clusters.xy)
                )
                np.testing.assert_allclose(
                    np.asarray(fast.clusters.rgb),
                    np.asarray(base.clusters.rgb), atol=1e-3,
                )
                np.testing.assert_allclose(
                    np.asarray(fast.clusters.center),
                    np.asarray(base.clusters.center), rtol=1e-5, atol=1e-3,
                )
        finally:
            slic.force_cell(None)


def test_capped_fallback_on_drifted_labels(small_scene):
    """The lax.cond guard: feed segment() a label state that VIOLATES the
    capped-locality invariant and check the auto route still equals the
    global route (the fallback branch must actually run and be correct).
    Done at the op level: one capped iteration via the internal helpers."""
    color, depth, points, _ = _setup(small_scene)
    h, w = depth.shape
    grid = GridParams(rows=3, cols=4)
    # adversarial labels: a block of pixels in the last cell claims cluster 0
    # (cell offset far outside any cap)
    labels = np.asarray(slic.init_labels(grid, h, w)).copy()
    labels[-8:, -8:] = 0  # cell offset (-2, -3) from the last cell
    ok = bool(
        slic.labels_within_cap(jnp.asarray(labels), grid, 1, h, w)
    )
    assert not ok
    # well-localised labels pass
    assert bool(
        slic.labels_within_cap(
            jnp.asarray(slic.init_labels(grid, h, w)), grid, 1, h, w
        )
    )


def test_subgrid_seed_fast_path_matches_full(small_scene):
    """At cell sizes where the seed windows' gradient support fits inside a
    cell, seeds computed on the extracted sub-grid must be bit-identical to
    the full-image computation (both SP-style and NASP gradients)."""
    h, w = 96, 128
    color = np.broadcast_to(small_scene["color"][:h, :w], (h, w, 3)).astype(np.uint8)
    rng = np.random.default_rng(3)
    color = (color.astype(np.int32) + rng.integers(0, 30, (h, w, 3))).clip(0, 255).astype(np.uint8)
    n = rng.normal(size=(h, w, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n[rng.random((h, w)) < 0.1] = -1.0
    grid = GridParams(rows=3, cols=4)
    color_f = jnp.asarray(color, jnp.float32)
    for variant, window in (("sp", 16), ("dasp", 4), ("nasp", 8)):
        assert slic._subgrid_ok(grid, h, w, window)
        fast = slic._compute_seeds(
            color_f, jnp.asarray(n), grid, h, w, window, variant
        )
        if variant == "nasp":
            grad = slic._nasp_gradient(color_f, jnp.asarray(n))
        else:
            grad = slic._color_gradient(color_f)
        full = slic.sample_seeds(grad, grid, h, w, window)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(full))
