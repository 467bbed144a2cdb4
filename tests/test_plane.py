import numpy as np
import jax.numpy as jnp

from kinectdepthmapenhancement_tpu.core.camera import (
    default_kinect_intrinsics,
    normalized_rays,
    projective_to_real,
)
from kinectdepthmapenhancement_tpu.core.config import ProjectionParams
from kinectdepthmapenhancement_tpu.ops import plane


def _rays(h, w):
    intr = default_kinect_intrinsics(w, h)
    return intr, normalized_rays(intr, h, w)


def test_project_puts_points_on_plane():
    h, w = 32, 48
    intr, rays = _rays(h, w)
    n = np.array([0.1, -0.2, 0.97], np.float32)
    n /= np.linalg.norm(n)
    d = 2000.0
    nd_map = jnp.broadcast_to(jnp.asarray(np.r_[n, d], jnp.float32), (h, w, 4))
    labels = jnp.zeros((h, w), jnp.int32)
    variance = jnp.asarray([0.99], jnp.float32)
    pts = jnp.zeros((h, w, 3), jnp.float32)
    out = np.asarray(plane.set_pseudo_depth_map(pts, rays, nd_map, labels, variance))
    resid = np.abs(out @ n - d)
    assert np.quantile(resid, 0.99) < 1.0  # mm


def test_pseudo_depth_gates():
    h, w = 8, 8
    intr, rays = _rays(h, w)
    pts = jnp.full((h, w, 3), 123.0, jnp.float32)
    nd_map = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0, 1000.0], jnp.float32), (h, w, 4)
    )
    labels = jnp.zeros((h, w), jnp.int32)
    # incoherent cluster (variance below cos(pi/8)) -> passthrough
    out = np.asarray(
        plane.set_pseudo_depth_map(pts, rays, nd_map, labels, jnp.asarray([0.5]))
    )
    np.testing.assert_array_equal(out, 123.0)
    # label -1 -> passthrough
    out = np.asarray(
        plane.set_pseudo_depth_map(
            pts, rays, nd_map, jnp.full((h, w), -1, jnp.int32), jnp.asarray([0.99])
        )
    )
    np.testing.assert_array_equal(out, 123.0)


def test_variance_optimization_snap_and_blend():
    h, w = 4, 4
    labels = jnp.zeros((h, w), jnp.int32)
    variance = jnp.asarray([0.95], jnp.float32)
    sizes = jnp.asarray([2000], jnp.int32)
    rays = jnp.concatenate(
        [jnp.zeros((h, w, 2), jnp.float32), jnp.ones((h, w, 1), jnp.float32)], -1
    )
    zo = jnp.full((h, w), 1000.0, jnp.float32)
    opt = rays * zo[..., None]
    # 0.5% difference -> snap to plane
    pf = rays * jnp.full((h, w, 1), 1005.0)
    out = np.asarray(plane.variance_optimization(opt, pf, labels, variance, sizes))
    np.testing.assert_allclose(out[..., 2], 1005.0)
    # 2% difference -> blend by variance
    pf = rays * jnp.full((h, w, 1), 1020.0)
    out = np.asarray(plane.variance_optimization(opt, pf, labels, variance, sizes))
    np.testing.assert_allclose(out[..., 2], 1020.0 * 0.95 + 1000.0 * 0.05, rtol=1e-6)
    # small cluster -> untouched
    out = np.asarray(
        plane.variance_optimization(opt, pf, labels, variance, jnp.asarray([100]))
    )
    np.testing.assert_allclose(out[..., 2], 1000.0)


def test_mrf_optimization_converges_to_plane():
    """Noisy depth near a plane, fully gated: sweeps smooth toward the
    plane-consistent neighbourhood average."""
    h, w = 24, 32
    intr, rays = _rays(h, w)
    rng = np.random.default_rng(0)
    z_true = 2000.0
    z_noisy = z_true + rng.normal(0, 3.0, (h, w)).astype(np.float32)
    opt = np.asarray(rays) * z_noisy[..., None]
    pf = np.asarray(rays) * np.full((h, w, 1), z_true, np.float32)
    out = np.asarray(
        plane.mrf_optimization(jnp.asarray(opt), jnp.asarray(pf), rays)
    )
    assert np.std(out[2:-2, 2:-2, 2]) < np.std(z_noisy[2:-2, 2:-2]) * 0.9


def test_depth_bilateral_zero_without_support():
    h, w = 8, 8
    intr, rays = _rays(h, w)
    opt = jnp.zeros((h, w, 3), jnp.float32)
    out = np.asarray(plane.depth_bilateral(opt, rays))
    np.testing.assert_array_equal(out, 0.0)


def test_pca_planes_recover_synthetic_planes():
    """Three labelled regions on known planes; fitted nd must match, centres
    must be the means, sign flipped so d >= 0; tiny clusters invalid."""
    h, w = 48, 64
    intr = default_kinect_intrinsics(w, h)
    rng = np.random.default_rng(1)
    labels = np.zeros((h, w), np.int64)
    labels[:, 24:48] = 1
    labels[:, 48:] = 2
    labels[0, 0] = 3  # 1-pixel cluster -> invalid
    planes_n = np.array(
        [[0.0, 0.0, 1.0], [0.3, 0.1, 0.949], [-0.2, 0.2, 0.959]], np.float64
    )
    planes_n /= np.linalg.norm(planes_n, axis=-1, keepdims=True)
    planes_d = [2000.0, 2500.0, 1800.0]
    rays = np.asarray(normalized_rays(intr, h, w), np.float64)
    pts = np.zeros((h, w, 3), np.float64)
    for k in range(3):
        denom = rays @ planes_n[k]
        z = planes_d[k] / denom
        m = labels == k
        pts[m] = (rays * z[..., None])[m]
    pts += rng.normal(0, 0.5, pts.shape)

    res = plane.pca_planes(jnp.asarray(pts, jnp.float32), jnp.asarray(labels, jnp.int32), 4)
    nd = np.asarray(res.nd)
    for k in range(3):
        assert abs(np.dot(nd[k, :3], planes_n[k])) > 0.9999
        assert abs(nd[k, 3] - planes_d[k]) < 3.0
        assert np.dot(nd[k, :3], np.asarray(res.centers)[k]) >= 0.0
    assert np.all(nd[3, :3] == 5.0)
    # eigenvalue ~ noise variance (sigma^2 = 0.25)
    assert np.all(np.asarray(res.eigenvalues)[:3] < 2.0)


def test_pca_planes_matches_numpy_eigh():
    h, w = 24, 32
    rng = np.random.default_rng(2)
    pts = rng.normal(0, 100.0, (h, w, 3)) + np.array([0, 0, 2000.0])
    labels = (np.arange(h * w).reshape(h, w) // ((h * w) // 4)).clip(0, 3)
    res = plane.pca_planes(jnp.asarray(pts, jnp.float32), jnp.asarray(labels, jnp.int32), 4)
    for k in range(4):
        m = labels == k
        p = pts[m]
        mean = p.mean(0)
        cov = ((p - mean).T @ (p - mean)) / len(p)
        evs, vecs = np.linalg.eigh(cov)
        v = vecs[:, 0]
        got_n = np.asarray(res.nd)[k, :3]
        assert min(np.linalg.norm(got_n - v), np.linalg.norm(got_n + v)) < 5e-2
        np.testing.assert_allclose(np.asarray(res.centers)[k], mean, rtol=1e-4)
        assert abs(float(res.eigenvalues[k]) - evs[0]) < 0.05 * max(evs[0], 1.0)
