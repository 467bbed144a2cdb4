import numpy as np
import jax.numpy as jnp

from kinectdepthmapenhancement_tpu.core.camera import projective_to_real
from kinectdepthmapenhancement_tpu.core.config import NormalParams
from kinectdepthmapenhancement_tpu.ops import integral, normals

import oracle_normals


def _vertices(small_scene, h=64, w=96):
    depth = small_scene["depth"][:h, :w]
    intr = small_scene["intr"]
    pts = np.asarray(projective_to_real(jnp.asarray(depth), intr), np.float64)
    return pts / 1000.0  # metres


def test_integral_box_sums_match_direct(small_scene):
    vm = _vertices(small_scene, 32, 48).astype(np.float32)
    valid = vm[..., 2] != 0.0
    chans = jnp.asarray(np.stack([vm[..., 0], vm[..., 2] ** 2], axis=-1))
    ci = integral.build(chans, jnp.asarray(valid))
    rng = np.random.default_rng(0)
    for _ in range(20):
        u, v = int(rng.integers(0, 40)), int(rng.integers(0, 24))
        uu, vv = int(rng.integers(1, 8)), int(rng.integers(1, 8))
        got = float(integral.box_sum(ci, 0, u, v, uu, vv))
        want = np.asarray(chans)[v + 1 : v + vv + 1, u + 1 : u + uu + 1, 0].sum()
        assert abs(got - want) < 1e-3 + 1e-5 * abs(want)
        gotc = float(integral.box_count(ci, u, v, uu, vv))
        wantc = valid[v + 1 : v + vv + 1, u + 1 : u + uu + 1].sum()
        assert gotc == wantc


def test_dci_map_matches_oracle(small_scene):
    vm = _vertices(small_scene, 48, 64)
    got = np.asarray(normals.dci_map(jnp.asarray(vm, jnp.float32), 0.05))
    want = oracle_normals.dci_map(vm)
    np.testing.assert_array_equal(got, want)


def test_distance_transform_matches_two_pass(small_scene):
    vm = _vertices(small_scene, 48, 64)
    dci = oracle_normals.dci_map(vm)
    got = np.asarray(normals.distance_transform(jnp.asarray(dci, jnp.int32), 26))
    want = oracle_normals.distance_transform(dci)
    # equality where distances are within the relaxation horizon; beyond the
    # cap both maps exceed every smoothing bound so parity is irrelevant
    mask = want <= 24.0
    np.testing.assert_allclose(got[mask], want[mask], atol=1e-4)


def test_smoothing_map_matches_oracle(small_scene):
    vm = _vertices(small_scene, 48, 64)
    got = np.asarray(normals.smoothing_map(jnp.asarray(vm, jnp.float32), NormalParams()))
    want = oracle_normals.smoothing_map(vm)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_eigensolver_matches_oracle_and_eigh():
    rng = np.random.default_rng(1)
    mats = []
    for _ in range(50):
        a = rng.normal(size=(3, 10))
        mats.append((a @ a.T).ravel())
    for m in mats:
        ev_o, vec_o = oracle_normals.smallest_eigenvector(m)
        cov = jnp.asarray(m.reshape(3, 3), jnp.float32)[None]
        ev_j, vec_j = normals.smallest_eigenvector(cov)
        ev_j = float(ev_j[0])
        vec_j = np.asarray(vec_j[0], np.float64)
        evs = np.linalg.eigvalsh(m.reshape(3, 3))
        assert abs(ev_j - evs[0]) < 1e-3 * max(1.0, abs(evs[0]))
        # eigenvector parity up to sign
        assert min(np.linalg.norm(vec_j - vec_o), np.linalg.norm(vec_j + vec_o)) < 1e-2


def test_bilateral_normals_match_oracle(small_scene):
    vm = _vertices(small_scene, 40, 48)
    got = np.asarray(normals.bilateral_normals(jnp.asarray(vm, jnp.float32)))
    want = oracle_normals.bilateral_normals(vm)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_cm_normals_match_oracle(small_scene):
    vm = _vertices(small_scene, 64, 96)
    p = NormalParams(method="cm")
    got = np.asarray(
        normals.generate_normal_map(jnp.asarray(vm * 1000.0, jnp.float32), p)
    )
    want = oracle_normals.generate(vm * 1000.0, method="cm")
    valid_o = np.any(want != -1.0, axis=-1)
    valid_j = np.any(got != -1.0, axis=-1)
    # validity masks agree
    assert (valid_o == valid_j).mean() > 0.995
    both = valid_o & valid_j
    dots = np.abs(np.sum(got[both] * want[both], axis=-1))
    # angular agreement within ~1.5 degrees for 95% of valid pixels
    assert np.quantile(dots, 0.05) > np.cos(np.deg2rad(1.5))


def test_sdc_normals_match_oracle(small_scene):
    vm = _vertices(small_scene, 64, 96)
    p = NormalParams(method="sdc")
    got = np.asarray(
        normals.generate_normal_map(jnp.asarray(vm * 1000.0, jnp.float32), p)
    )
    want = oracle_normals.generate(vm * 1000.0, method="sdc")
    valid_o = np.any(want != -1.0, axis=-1)
    valid_j = np.any(got != -1.0, axis=-1)
    assert (valid_o == valid_j).mean() > 0.995
    both = valid_o & valid_j
    dots = np.abs(np.sum(got[both] * want[both], axis=-1))
    assert np.quantile(dots, 0.05) > np.cos(np.deg2rad(1.5))


def test_cm_normals_flat_plane_accuracy():
    """On a clean frontal plane the CM normal must be (0, 0, +-1) to high
    accuracy in the interior."""
    h, w = 64, 96
    vm = np.zeros((h, w, 3), np.float32)
    fx = 575.0
    u = (np.arange(w) - w / 2) / fx
    v = (h / 2 - np.arange(h)) / fx
    vm[..., 2] = 2.0
    vm[..., 0] = u[None, :] * 2.0
    vm[..., 1] = v[:, None] * 2.0
    got = np.asarray(normals.generate_normal_map(jnp.asarray(vm * 1000.0), NormalParams()))
    interior = got[30:40, 40:60]
    assert np.all(np.abs(interior[..., 2]) > 0.9999)
