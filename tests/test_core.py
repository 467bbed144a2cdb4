import numpy as np
import jax.numpy as jnp

from kinectdepthmapenhancement_tpu.core import buffer2d, camera, io

import oracle


def test_projective_to_real_matches_oracle(small_scene):
    intr = small_scene["intr"]
    depth = small_scene["depth"][:32, :48]
    got = np.asarray(camera.projective_to_real(jnp.asarray(depth), intr))
    want = oracle.projective_to_real(depth, intr.fx, intr.fy, intr.cx, intr.cy)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_real_to_projective_roundtrip(small_scene):
    intr = small_scene["intr"]
    depth = jnp.asarray(small_scene["depth"])
    pts = camera.projective_to_real(depth, intr)
    uvz = camera.real_to_projective(pts, intr)
    h, w = depth.shape
    uu, vv = np.meshgrid(np.arange(w), np.arange(h))
    valid = np.asarray(depth) > 50.0
    np.testing.assert_allclose(np.asarray(uvz[..., 0])[valid], uu[valid], atol=1e-2)
    np.testing.assert_allclose(np.asarray(uvz[..., 1])[valid], vv[valid], atol=1e-2)
    # |z| < 1 sentinel
    assert np.all(np.asarray(uvz[..., 0])[~valid & (np.asarray(depth) < 1.0)] == -1.0)


def test_normalized_rays_unit_z(small_scene):
    intr = small_scene["intr"]
    rays = camera.normalized_rays(intr, 8, 16)
    assert rays.shape == (8, 16, 3)
    np.testing.assert_allclose(np.asarray(rays[..., 2]), 1.0)


def test_buffer2d_update_rule():
    buf = buffer2d.init(2, 2)
    d1 = jnp.array([[1000.0, 40.0], [0.0, 2000.0]], jnp.float32)
    buf = buffer2d.update(buf, d1)
    # valid pixels initialise, invalid (<=50) stay empty
    np.testing.assert_allclose(np.asarray(buf.depth), [[1000.0, 0.0], [0.0, 2000.0]])
    np.testing.assert_allclose(np.asarray(buf.weight), [[1.0, 0.0], [0.0, 1.0]])
    # agreeing sample merges with the reference's (d*(w+1)+new*w)/(2w+1) rule
    d2 = jnp.array([[1005.0, 40.0], [0.0, 2500.0]], jnp.float32)
    buf = buffer2d.update(buf, d2)
    assert np.isclose(buf.depth[0, 0], (1000.0 * 2 + 1005.0 * 1) / 3.0)
    assert buf.weight[0, 0] == 2.0
    # disagreeing sample (2500 vs 2000) is dropped
    assert buf.depth[1, 1] == 2000.0 and buf.weight[1, 1] == 1.0


def test_buffer2d_accumulate_converges():
    import jax

    key = jax.random.PRNGKey(0)
    gt = jnp.full((4, 4), 3000.0, jnp.float32)
    frames = jnp.stack(
        [buffer2d.synthetic_noise(k, gt) for k in jax.random.split(key, 50)]
    )
    buf = buffer2d.accumulate(buffer2d.init(4, 4), frames)
    # the reference update rule is asymptotically an EMA with alpha=1/2, so the
    # buffer stays within ~sigma of the truth rather than fully averaging out
    bound = 0.45 * 2.85 * (3000.0 / 10.0) ** 2 / 1e4
    np.testing.assert_allclose(np.asarray(buf.depth), 3000.0, atol=bound)


def test_filestorage_xml_roundtrip(tmp_path):
    p = str(tmp_path / "depth.xml")
    mats = {
        "averaged_depth": np.arange(12, dtype=np.float32).reshape(3, 4) * 1.5,
        "depth": np.linspace(0, 4000, 12, dtype=np.float32).reshape(3, 4),
    }
    io.write_filestorage_xml(p, mats)
    back = io.read_filestorage_xml(p)
    for k in mats:
        np.testing.assert_allclose(back[k], mats[k], rtol=1e-6)


def test_synthetic_noise_magnitude():
    import jax

    gt = jnp.full((16, 16), 3000.0, jnp.float32)
    noisy = buffer2d.synthetic_noise(jax.random.PRNGKey(1), gt)
    bound = 0.45 * 2.85 * (3000.0 / 10.0) ** 2 / 1e4
    assert np.all(np.abs(np.asarray(noisy) - 3000.0) <= bound + 1e-3)
