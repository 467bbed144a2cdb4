"""Pallas kernels vs their XLA reference paths (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from kinectdepthmapenhancement_tpu.core.config import JBFParams
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
