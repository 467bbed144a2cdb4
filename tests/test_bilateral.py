import numpy as np
import jax
import jax.numpy as jnp

from kinectdepthmapenhancement_tpu.core.config import JBFParams, MRFParams
from kinectdepthmapenhancement_tpu.ops import bilateral

import oracle


def _crop(d):
    return {k: (v[:40, :48] if hasattr(v, "shape") and v.ndim >= 2 else v) for k, v in d.items()}


def test_guide_bilateral_matches_oracle(small_scene):
    color = small_scene["color"][:32, :40]
    got = np.asarray(bilateral.guide_bilateral(jnp.asarray(color), JBFParams()))
    want = oracle.guide_bilateral(color)
    # u8 rounding boundaries may flip by 1 in f32 vs f64
    assert np.mean(np.abs(got.astype(int) - want.astype(int)) <= 1) > 0.999


def test_jbf_matches_oracle(small_scene):
    color = small_scene["color"][:40, :48]
    depth = small_scene["depth"][:40, :48]
    p = JBFParams()
    guide = oracle.guide_bilateral(
        color, p.guide_diameter, p.guide_color_sigma, p.guide_spatial_sigma
    )
    want = oracle.joint_bilateral_filter(depth.astype(np.float64), guide)
    got = np.asarray(
        bilateral._jbf_core(
            jnp.asarray(depth),
            jnp.asarray(guide, jnp.float32),
            window=p.window,
            spatial_sigma=p.spatial_sigma,
            color_sigma=p.color_sigma,
            depth_sigma=p.depth_sigma,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=0.25)


def test_jbf_zero_where_no_support():
    depth = jnp.zeros((16, 16), jnp.float32)
    color = jnp.zeros((16, 16, 3), jnp.uint8)
    out = bilateral.joint_bilateral_filter(depth, color)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_jbf_constant_region_identity():
    """On constant valid depth and constant colour, the filter is an average
    of identical values -> identity."""
    depth = jnp.full((20, 20), 1234.0, jnp.float32)
    color = jnp.full((20, 20, 3), 128, jnp.uint8)
    out = bilateral.joint_bilateral_filter(depth, color)
    np.testing.assert_allclose(np.asarray(out), 1234.0, rtol=1e-5)


def test_mrf_matches_oracle(small_scene):
    color = small_scene["color"][:40, :48]
    depth = small_scene["depth"][:40, :48]
    want = oracle.markov_random_field(depth.astype(np.float64), color)
    got = np.asarray(
        bilateral.markov_random_field(jnp.asarray(depth), jnp.asarray(color), MRFParams())
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=0.25)


def test_mrf_preserves_invalid_center_zero_neighbors():
    """Isolated invalid centre with no valid neighbours: numerator=z, den=1."""
    depth = jnp.zeros((8, 8), jnp.float32)
    color = jnp.zeros((8, 8, 3), jnp.uint8)
    out = bilateral.markov_random_field(depth, color)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_jbf_batch_vmap(small_scene):
    depth = jnp.stack([jnp.asarray(small_scene["depth"][:32, :32])] * 3)
    color = jnp.stack([jnp.asarray(small_scene["color"][:32, :32])] * 3)
    out = jax.vmap(lambda d, c: bilateral.joint_bilateral_filter(d, c))(depth, color)
    assert out.shape == (3, 32, 32)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[2]))
