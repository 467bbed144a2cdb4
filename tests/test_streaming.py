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
