"""Test harness: force an 8-device virtual CPU mesh before jax is imported.

All unit tests run on CPU (fast, deterministic); distributed tests use the
8 virtual devices, mirroring how the driver dry-runs the multi-chip path.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon site config pins JAX_PLATFORMS=axon and ignores the env override;
# jax.config.update is the only reliable way to force CPU for unit tests.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()  # reruns of the suite start warm

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
