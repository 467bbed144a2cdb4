import numpy as np
import pytest

from kinectdepthmapenhancement_tpu import native
from kinectdepthmapenhancement_tpu.core import io


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip(f"native toolchain unavailable: {native.build_error()}")


def test_native_xml_read_matches_python(tmp_path, lib_ok):
    p = str(tmp_path / "depth.xml")
    rng = np.random.default_rng(0)
    depth = rng.uniform(0, 5000, (12, 16)).astype(np.float32)
    io.write_filestorage_xml(p, {"averaged_depth": depth * 0.5, "depth": depth})
    got = native.read_depth_xml(p, "depth", 16, 12)
    np.testing.assert_allclose(got, depth, rtol=1e-6)
    got2 = native.read_depth_xml(p, "averaged_depth", 16, 12)
    np.testing.assert_allclose(got2, depth * 0.5, rtol=1e-6)


def test_framesource_streams_round_robin(tmp_path, lib_ok):
    frames = []
    paths = []
    rng = np.random.default_rng(1)
    for i in range(3):
        f = rng.uniform(0, 4000, (8, 10)).astype(np.float32)
        p = str(tmp_path / f"frame{i}.bin")
        f.tofile(p)
        frames.append(f)
        paths.append(p)
    with native.FrameSource(paths, width=10, height=8, capacity=2) as src:
        seen = [src.next() for _ in range(6)]
        assert src.io_errors() == 0
    for i, s in enumerate(seen):
        np.testing.assert_allclose(s, frames[i % 3])


def test_framesource_xml_frames(tmp_path, lib_ok):
    depth = np.arange(48, dtype=np.float32).reshape(6, 8) * 10.0
    p = str(tmp_path / "d.xml")
    io.write_filestorage_xml(p, {"depth": depth})
    with native.FrameSource([p], width=8, height=6) as src:
        got = src.next()
    np.testing.assert_allclose(got, depth, rtol=1e-6)
