"""Test configuration: force CPU with 8 virtual devices.

NOTE: this image's sitecustomize pre-registers the axon TPU backend and the
env pins JAX_PLATFORMS=axon, so the env-var route is dead by the time
conftest runs.  Backend *initialisation* is lazy though, so updating the jax
config here still wins — tests always run on 8 virtual CPU devices
(SURVEY.md §4: sharding/collective correctness without a pod).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent XLA compile cache: the fast tier is dominated by CPU compiles
# of the composed pipelines (a 96x128 KDE step alone is minutes); warm-cache
# reruns skip them entirely.  Keyed by HLO hash, so edits invalidate safely.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_TEST_COMPILE_CACHE", "/tmp/jax_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def small_scene():
    """Small procedural RGB-D scene for op-level golden tests."""
    from kinectdepthmapenhancement_tpu.core.testdata import make_noisy_scene
    from kinectdepthmapenhancement_tpu.core.camera import default_kinect_intrinsics

    h, w = 96, 128
    intr = default_kinect_intrinsics(w, h)
    color, noisy, gt = make_noisy_scene(h, w, intr, seed=3)
    return {"color": color, "depth": noisy, "gt": gt, "intr": intr}


@pytest.fixture(scope="session")
def full_scene():
    """Full 640x480 scene for end-to-end pipeline tests."""
    from kinectdepthmapenhancement_tpu.core.testdata import make_noisy_scene
    from kinectdepthmapenhancement_tpu.core.camera import default_kinect_intrinsics

    intr = default_kinect_intrinsics()
    color, noisy, gt = make_noisy_scene(480, 640, intr, seed=0)
    return {"color": color, "depth": noisy, "gt": gt, "intr": intr}
