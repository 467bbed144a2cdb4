"""CLI round-trip: enhance a small frame end-to-end through the file-replay
path (main.cpp:139-163 analog)."""

import numpy as np
import pytest

from kinectdepthmapenhancement_tpu import cli
from kinectdepthmapenhancement_tpu.core import io
from kinectdepthmapenhancement_tpu.core.camera import default_kinect_intrinsics
from kinectdepthmapenhancement_tpu.core.testdata import make_noisy_scene


def test_cli_enhance_jbf(tmp_path):
    h, w = 48, 64
    intr = default_kinect_intrinsics(w, h)
    color, noisy, gt = make_noisy_scene(h, w, intr, seed=4)

    depth_xml = str(tmp_path / "depth.xml")
    color_png = str(tmp_path / "color.png")
    io.write_filestorage_xml(depth_xml, {"depth": noisy})
    from PIL import Image

    Image.fromarray(color).save(color_png)

    out_xml = str(tmp_path / "refined.xml")
    ply = str(tmp_path / "cloud.ply")
    png = str(tmp_path / "depth.png")
    rc = cli.main(
        [
            "enhance",
            "--depth", depth_xml,
            "--color", color_png,
            "--pipeline", "jbf",
            "--out", out_xml,
            "--ply", ply,
            "--png", png,
        ]
    )
    assert rc == 0
    refined = io.read_filestorage_xml(out_xml)["depth"]
    assert refined.shape == (h, w)
    assert np.isfinite(refined).all()
    # JBF must actually have refined: output differs from input but stays in
    # the scene's depth range
    assert not np.array_equal(refined, noisy)
    valid = refined > 50.0
    assert valid.mean() > 0.8
    assert (refined[valid] < 15000.0).all()
    assert open(ply).readline().strip() == "ply"
    from PIL import Image as I2

    assert I2.open(png).size == (w, h)


def test_cli_evaluate_tum(tmp_path):
    """`evaluate --tum` end-to-end (Kinect-model sequence, cheap method
    subset): writes a parseable evaluation.txt with runtime+error sections."""
    from kinectdepthmapenhancement_tpu.core import datasets

    h, w = 48, 64
    intr = default_kinect_intrinsics(w, h)
    color, _, gt = make_noisy_scene(h, w, intr, seed=9)
    rng = np.random.default_rng(9)
    frames = [
        (10.0 + 0.033 * i, color, datasets.kinect_v1_sensor_model(gt, rng))
        for i in range(4)
    ]
    root = str(tmp_path / "seq")
    datasets.write_tum_sequence(root, frames)
    out = str(tmp_path / "evaluation.txt")
    rc = cli.main(
        [
            "evaluate", out,
            "--tum", root,
            "--frames", "4",
            "--methods", "input,jbf",
            "--timing-iters", "1",
        ]
    )
    assert rc == 0
    text = open(out).read()
    assert text.startswith("runtime")
    assert "error" in text
    lines = [l for l in text.splitlines() if l.startswith(("input ", "jbf "))]
    assert len(lines) == 2
    # "name err  (rmse R mm, n=N)" rows parse to finite numbers
    for line in lines:
        err = float(line.split()[1])
        assert np.isfinite(err)


@pytest.mark.full
def test_cli_enhance_kde_debug_dir(tmp_path):
    """--debug-dir writes the per-frame segmentation/labelImage/normals/depth
    renders (the reference's imwrite hooks behind a flag)."""
    h, w = 48, 64
    intr = default_kinect_intrinsics(w, h)
    color, noisy, gt = make_noisy_scene(h, w, intr, seed=4)
    depth_xml = str(tmp_path / "depth.xml")
    color_png = str(tmp_path / "color.png")
    io.write_filestorage_xml(depth_xml, {"depth": noisy})
    from PIL import Image

    Image.fromarray(color).save(color_png)
    dbg = str(tmp_path / "dbg")
    rc = cli.main(
        [
            "enhance",
            "--depth", depth_xml,
            "--color", color_png,
            "--pipeline", "kde",
            "--out", str(tmp_path / "refined.xml"),
            "--debug-dir", dbg,
        ]
    )
    assert rc == 0
    import os

    files = sorted(os.listdir(dbg))
    suffixes = {f.split("_", 1)[1] for f in files}
    assert suffixes == {
        "segmentation.png", "labelImage.png", "normals.png", "depth.png"
    }
    for f in files:
        im = Image.open(os.path.join(dbg, f))
        assert im.size == (w, h)
