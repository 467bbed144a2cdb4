import numpy as np
import jax.numpy as jnp

from kinectdepthmapenhancement_tpu.core.config import ERSParams
from kinectdepthmapenhancement_tpu.ops import ers

import oracle_ers


def _labels_setup(small_scene, h=40, w=48):
    """Blocky colour/depth label maps with deliberately offset boundaries."""
    color = small_scene["color"][:h, :w]
    depth = small_scene["depth"][:h, :w].astype(np.float64)
    color_labels = np.zeros((h, w), np.int64)
    depth_labels = np.zeros((h, w), np.int64)
    # colour boundary at x=20/ y=22; depth boundary offset by 2 px
    color_labels[:, 20:] = 1
    color_labels[22:, :] += 2
    depth_labels[:, 22:] = 1
    depth_labels[24:, :] += 2
    return color, depth, color_labels, depth_labels


def test_edge_refine_matches_oracle(small_scene):
    color, depth, cl, dl = _labels_setup(small_scene)
    got = ers.edge_refine(
        jnp.asarray(cl, jnp.int32), jnp.asarray(dl, jnp.int32),
        jnp.asarray(depth, jnp.float32),
    )
    wl, wd = oracle_ers.edge_refine(cl, dl, depth)
    np.testing.assert_array_equal(np.asarray(got.labels), wl)
    np.testing.assert_allclose(np.asarray(got.depth), wd, rtol=1e-6)


def test_depth_enhance_matches_oracle(small_scene):
    color, depth, cl, dl = _labels_setup(small_scene, h=28, w=32)
    refined = ers.edge_refine(
        jnp.asarray(cl, jnp.int32), jnp.asarray(dl, jnp.int32),
        jnp.asarray(depth, jnp.float32),
    )
    got = ers.depth_enhance(refined, jnp.asarray(color))
    want = oracle_ers.depth_enhance(
        np.asarray(refined.depth, np.float64), np.asarray(refined.labels), color
    )
    # the adaptive-sigma recurrence compounds 0.3^k per tap, so the colour
    # weights are exquisitely sensitive to f32 vs f64; differences stay
    # sub-millimetre but are broad — bound magnitude, not exactness
    got = np.asarray(got)
    assert (np.abs(got - want) < 1.0).mean() > 0.98
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2.0)


def test_edge_refine_no_boundaries_identity(small_scene):
    """Uniform labels: nothing moves, depth untouched."""
    color, depth, _, _ = _labels_setup(small_scene, h=16, w=16)
    cl = np.zeros((16, 16), np.int64)
    dl = np.zeros((16, 16), np.int64)
    got = ers.edge_refine(
        jnp.asarray(cl, jnp.int32), jnp.asarray(dl, jnp.int32),
        jnp.asarray(depth, jnp.float32),
    )
    np.testing.assert_array_equal(np.asarray(got.labels), dl)
    np.testing.assert_allclose(np.asarray(got.depth), depth, rtol=1e-6)


def test_boundary_snaps_to_color_edge():
    """Depth boundary 2 px right of the colour edge: the pixels between are
    relabelled to the right region's depth label."""
    h, w = 8, 16
    color = np.zeros((h, w, 3), np.uint8)
    color[:, 8:] = 200
    cl = np.zeros((h, w), np.int64)
    cl[:, 8:] = 1
    dl = np.zeros((h, w), np.int64)
    dl[:, 10:] = 1  # depth edge at x=10, colour edge at x=8
    depth = np.full((h, w), 2000.0, np.float32)
    got = ers.edge_refine(
        jnp.asarray(cl, jnp.int32), jnp.asarray(dl, jnp.int32), jnp.asarray(depth)
    )
    lab = np.asarray(got.labels)
    # boundary pixel x=9 (dl[9]=0 != dl[10]=1): left scan hits colour change
    # at x=7 (distance 2) -> pixels 8..9 get the right label (1)
    assert lab[0, 8] == 1 and lab[0, 9] == 1
    assert lab[0, 7] == 0 and lab[0, 10] == 1
