import dataclasses

import numpy as np
import jax.numpy as jnp

from kinectdepthmapenhancement_tpu.core.camera import default_kinect_intrinsics
from kinectdepthmapenhancement_tpu.core.config import GridParams, KDEConfig
from kinectdepthmapenhancement_tpu.core.testdata import make_noisy_scene
from kinectdepthmapenhancement_tpu.models import streaming
from kinectdepthmapenhancement_tpu.utils import checkpoint, visualize


def _frames(gt, n, seed=0):
    rng = np.random.default_rng(seed)
    var = 0.45 * 2.85 * np.square(gt / 10.0) / 1.0e4
    for _ in range(n):
        yield (gt + rng.uniform(-1, 1, gt.shape) * var).astype(np.float32)


def test_stream_runs_and_checkpoints(tmp_path):
    h, w = 96, 128
    intr = default_kinect_intrinsics(w, h)
    color, noisy, gt = make_noisy_scene(h, w, intr, seed=1)
    cfg = dataclasses.replace(KDEConfig(), grid=GridParams(3, 4))
    ckpt = str(tmp_path / "stream.npz")

    state = streaming.run_stream(
        _frames(gt, 4), color, intr, cfg=cfg,
        checkpoint_path=ckpt, checkpoint_every=2,
    )
    assert state.frame_index == 4
    err = streaming.mean_metric(state, "kde_error_mm")
    assert np.isfinite(err) and err < 50.0

    # resume: a fresh run with the same checkpoint fast-forwards
    state2 = streaming.run_stream(
        _frames(gt, 6), color, intr, cfg=cfg,
        checkpoint_path=ckpt, checkpoint_every=2,
    )
    assert state2.frame_index == 6
    # buffer carried over (weights grew past 4 frames of agreement)
    assert float(jnp.max(state2.buffer.weight)) >= 4.0


def test_stream_kde_only_serving(tmp_path):
    """kde_only serving mode: no capture fold, checksum metric counts every
    frame, and on_outputs sees each chunk's refined points (still on device)
    with the right start indices and batch shape."""
    h, w = 96, 128
    intr = default_kinect_intrinsics(w, h)
    color, noisy, gt = make_noisy_scene(h, w, intr, seed=3)
    cfg = dataclasses.replace(KDEConfig(), grid=GridParams(3, 4))

    seen = []
    state = streaming.run_stream(
        _frames(gt, 5), color, intr, cfg=cfg, batch=2, kde_only=True,
        on_outputs=lambda start, pts: seen.append((start, pts.shape)),
    )
    assert state.frame_index == 5
    assert state.metric_counts["kde_checksum"] == 5
    assert seen == [(0, (2, h, w, 3)), (2, (2, h, w, 3)), (4, (1, h, w, 3))]
    # buffer untouched in serving mode
    assert float(jnp.max(state.buffer.weight)) == 0.0


import pytest


@pytest.mark.full
def test_stream_batch_size_invariant():
    """Chunked dispatch (models/streaming.py) is a pure throughput
    optimisation: metrics and final buffer are identical for batch=1 and
    batch=3 (the scan inside the chunk preserves frame order)."""
    h, w = 96, 128
    intr = default_kinect_intrinsics(w, h)
    color, noisy, gt = make_noisy_scene(h, w, intr, seed=2)
    cfg = dataclasses.replace(KDEConfig(), grid=GridParams(3, 4))

    s1 = streaming.run_stream(_frames(gt, 5), color, intr, cfg=cfg, batch=1)
    s3 = streaming.run_stream(_frames(gt, 5), color, intr, cfg=cfg, batch=3)
    assert s1.frame_index == s3.frame_index == 5
    assert s1.metric_counts == s3.metric_counts
    np.testing.assert_allclose(
        s1.metric_sums["kde_error_mm"], s3.metric_sums["kde_error_mm"], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s1.buffer.depth), np.asarray(s3.buffer.depth), rtol=1e-6
    )


def test_checkpoint_roundtrip(tmp_path):
    from kinectdepthmapenhancement_tpu.core import buffer2d

    buf = buffer2d.init(4, 4)
    st = checkpoint.StreamState(
        frame_index=7, buffer=buf, metric_sums={"a": 1.5}, metric_counts={"a": 3}
    )
    p = str(tmp_path / "c.npz")
    checkpoint.save(p, st)
    back = checkpoint.load(p)
    assert back.frame_index == 7
    assert back.metric_sums == {"a": 1.5}
    assert back.metric_counts == {"a": 3}
    np.testing.assert_array_equal(np.asarray(back.buffer.depth), 0.0)


def test_visualize_shapes(small_scene):
    labels = jnp.asarray(
        np.random.default_rng(0).integers(-1, 12, (32, 40)), jnp.int32
    )
    img = visualize.random_color_labels(labels, 12)
    assert img.shape == (32, 40, 3) and img.dtype == jnp.uint8
    assert np.all(np.asarray(img)[np.asarray(labels) < 0] == 0)

    color = jnp.asarray(small_scene["color"][:32, :40])
    b = visualize.label_boundaries(color, labels)
    assert b.shape == (32, 40, 3)

    d = visualize.depth_rgb(jnp.asarray(small_scene["depth"][:32, :40]))
    assert d.dtype == jnp.uint8
    n = visualize.normal_image(jnp.zeros((8, 8, 3)))
    assert np.all(np.asarray(n) == 127)


def test_depth_histogram_image():
    """Mirrors Kinect::CreateDepthImage: cumulative-histogram equalisation,
    nearer (smaller z) valid depth -> larger G/B value; z==0 -> 0."""
    depth = jnp.asarray(
        [[0.0, 1000.0, 1000.0, 3000.0], [3000.0, 3000.0, 0.0, 6000.0]],
        jnp.float32,
    )
    img = np.asarray(visualize.depth_histogram_image(depth))
    assert img.shape == (2, 4, 3) and img.dtype == np.uint8
    assert np.all(img[..., 0] == 0)  # blue-channel slot stays 0
    assert np.array_equal(img[..., 1], img[..., 2])
    g = img[..., 1].astype(int)
    assert g[0, 0] == 0 and g[1, 2] == 0  # invalid depth
    # cdf: 1000->2/6, 3000->5/6, 6000->6/6 ; value = 256*(1-cdf)
    assert g[0, 1] == int(np.float32(256.0 * (1 - 2 / 6)))
    assert g[0, 3] == int(np.float32(256.0 * (1 - 5 / 6)))
    assert g[1, 3] == 0


def test_save_video(tmp_path):
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (16, 24, 3), dtype=np.uint8) for _ in range(4)]
    p = tmp_path / "seg.gif"
    visualize.save_video(str(p), frames, fps=30.0)
    from PIL import Image

    with Image.open(p) as im:
        assert im.n_frames == 4
        assert im.size == (24, 16)


def test_point_cloud_and_ply(tmp_path, small_scene):
    from kinectdepthmapenhancement_tpu.core.camera import projective_to_real

    depth = jnp.asarray(small_scene["depth"])
    pts = projective_to_real(depth, small_scene["intr"])
    cloud = visualize.point_cloud(pts, small_scene["color"])
    assert cloud.shape[1] == 6
    assert cloud.shape[0] == int(np.sum(np.asarray(pts)[..., 2] > 50.0))
    assert np.all(cloud[:, 2] > 0.05)  # metres now

    p = tmp_path / "c.ply"
    visualize.save_ply(str(p), cloud[:10])
    text = p.read_text().splitlines()
    assert text[0] == "ply" and "element vertex 10" in text[2]
    assert len(text) == 10 + 10  # header 10 lines + 10 vertices
