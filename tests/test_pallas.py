"""Pallas kernels vs their XLA reference paths (interpret mode on CPU)."""

import numpy as np
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
