"""Test configuration: force CPU JAX with a virtual 8-device mesh so sharding
tests emulate a multi-chip TPU slice without hardware.

Note: this image's sitecustomize imports jax at interpreter startup (with
JAX_PLATFORMS=axon pointing at a remote TPU tunnel), so setting env vars here
is too late — we must go through jax.config after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
