"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding paths are exercised on a virtual CPU mesh
(xla_force_host_platform_device_count), substituting for a real pod; compute
tests run the same code single-device.  Must be set before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def testdata_dir():
    # Reference mock spectra are golden fixtures (read-only).
    return "/root/reference/testdata"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
