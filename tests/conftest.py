"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding paths are exercised on a virtual CPU mesh
(xla_force_host_platform_device_count), substituting for a real pod; compute
tests run the same code single-device.

Note: this environment's sitecustomize imports jax and registers the axon
TPU backend at interpreter start, so JAX_PLATFORMS in os.environ is already
baked in -- we must override through jax.config instead (XLA_FLAGS is still
read lazily at CPU-client creation, so setting it here works as long as no
test touched a device yet).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def testdata_dir():
    # Reference mock spectra are golden fixtures (read-only).
    return "/root/reference/testdata"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
