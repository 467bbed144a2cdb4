"""Real RGB-D data path: TUM loader/writer round-trip, association contract,
depth-PNG units, the Kinect v1 sensor model, and the real-sequence
evaluation protocol (pseudo-GT accumulation, main.cpp:86-116)."""

import numpy as np
import pytest

from kinectdepthmapenhancement_tpu.core import datasets
from kinectdepthmapenhancement_tpu.core.camera import default_kinect_intrinsics
from kinectdepthmapenhancement_tpu.core.testdata import make_noisy_scene


def _frames(n=4, h=32, w=40, seed=5):
    intr = default_kinect_intrinsics(w, h)
    color, _, gt = make_noisy_scene(h, w, intr, seed=seed)
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        depth = datasets.kinect_v1_sensor_model(gt, rng)
        out.append((1234.5 + 0.033 * i, color, depth))
    return out


def test_depth_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    depth = rng.uniform(400.0, 9000.0, (24, 32)).astype(np.float32)
    depth[0, :5] = 0.0
    p = str(tmp_path / "d.png")
    datasets.write_depth_png(p, depth)
    back = datasets.read_depth_png(p)
    # TUM storage = round(mm/0.2) -> max quantization error 0.1 mm (+ f32
    # read-side rounding at ~9000 mm)
    assert np.abs(back - depth).max() <= 0.1 + 1e-2
    assert (back[0, :5] == 0.0).all()


def test_tum_sequence_roundtrip(tmp_path):
    frames = _frames()
    root = str(tmp_path / "rgbd_dataset_freiburg1_synth")
    datasets.write_tum_sequence(root, frames)
    seq = datasets.TUMSequence(root)
    assert len(seq) == len(frames)
    # fr1 intrinsics selected from the directory name
    assert seq.intrinsics == datasets.TUM_INTRINSICS["fr1"]
    for got, (ts, color, depth) in zip(seq, frames):
        assert got.timestamp == pytest.approx(ts, abs=1e-6)
        np.testing.assert_array_equal(got.color, color)
        assert np.abs(got.depth - depth).max() <= 0.1 + 1e-5


def test_associate_greedy_nearest():
    a = [(0.00, "a0"), (0.10, "a1"), (0.50, "a2")]
    b = [(0.005, "b0"), (0.115, "b1"), (0.90, "b2")]
    pairs = datasets.associate(a, b, max_difference=0.02)
    # a2/b2 are 0.4 s apart -> unmatched; others matched nearest
    assert pairs == [(0, 0), (1, 1)]
    # an offset shifts b's clock
    pairs = datasets.associate(a, b, max_difference=0.02, offset=-0.4)
    assert (2, 2) in pairs


def test_paired_png_dataset(tmp_path):
    frames = _frames(n=3)
    import os

    from PIL import Image

    os.makedirs(tmp_path / "rgb")
    os.makedirs(tmp_path / "depth")
    for i, (_, color, depth) in enumerate(frames):
        Image.fromarray(color).save(tmp_path / "rgb" / f"{i:04d}.png")
        datasets.write_depth_png(
            str(tmp_path / "depth" / f"{i:04d}.png"), depth, scale_to_mm=1.0
        )
    ds = datasets.PairedPNGDataset(str(tmp_path))
    assert len(ds) == 3
    fr = ds[1]
    np.testing.assert_array_equal(fr.color, frames[1][1])
    # mm-unit PNGs: integer-mm quantization only
    assert np.abs(fr.depth - frames[1][2]).max() <= 0.5 + 1e-5


def test_kinect_sensor_model_banding():
    """The sensor model must quantize to disparity levels: measured depths
    take few distinct values per constant-depth region, with step ~=
    z^2 * (1/8) / (b*f), and z^2-growing spread."""
    rng = np.random.default_rng(7)
    bf = datasets.KINECT_BASELINE_MM * datasets.KINECT_FOCAL_PX
    for z in (1000.0, 3000.0):
        gt = np.full((64, 64), z, np.float32)
        meas = datasets.kinect_v1_sensor_model(gt, rng)
        vals = np.unique(meas)
        step = z * z * datasets.KINECT_DISPARITY_STEP / bf
        # few quantization levels, spaced by ~step
        assert len(vals) < 12
        gaps = np.diff(vals)
        assert np.all(np.abs(gaps - step) / step < 0.1)
        # unbiased to within a step
        assert abs(float(meas.mean()) - z) < step
    # invalid in, invalid out
    gt = np.zeros((8, 8), np.float32)
    assert (datasets.kinect_v1_sensor_model(gt, rng) == 0.0).all()


@pytest.mark.full
def test_evaluate_tum_sequence(tmp_path):
    """End-to-end real-data protocol: sensor-model TUM sequence -> pseudo-GT
    accumulation -> every method evaluated; KDE must beat the raw input."""
    from kinectdepthmapenhancement_tpu.core.config import GridParams
    from kinectdepthmapenhancement_tpu.utils import evaluate as ev

    h, w = 96, 128
    intr = default_kinect_intrinsics(w, h)
    color, _, gt = make_noisy_scene(h, w, intr, seed=6)
    rng = np.random.default_rng(6)
    frames = [
        (100.0 + 0.033 * i, color, datasets.kinect_v1_sensor_model(gt, rng))
        for i in range(8)
    ]
    root = str(tmp_path / "seq")
    datasets.write_tum_sequence(root, frames)
    results = ev.evaluate_tum(
        root, frames=8, include_sp_methods=False,
        grid=GridParams(rows=3, cols=4), timing_iters=1,
    )
    assert set(results) == {"input", "jbf", "mrf", "rgbf", "kde"}
    for name, r in results.items():
        assert np.isfinite(r["rmse_mm"]), name
        assert r["valid_px"] > 0.5 * h * w, name
    # the enhancement methods must denoise the banded sensor depth
    assert results["kde"]["rmse_mm"] < results["input"]["rmse_mm"]
    assert results["jbf"]["rmse_mm"] < results["input"]["rmse_mm"]
