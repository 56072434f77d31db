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


@pytest.fixture(scope="module", autouse=True)
def _drop_compiled_executables():
    """Free jit executables between test modules.

    Every compiled executable holds LLVM-JIT'd code in its own set of
    memory mappings; a single-process run of the full suite compiles
    thousands of variants and the process's mapping count grows ~2k/min
    (measured via /proc/self/maps) until it hits vm.max_map_count
    (65530 default), where the next mmap fails inside XLA:CPU's LLVM
    codegen and the compiler SEGFAULTS (observed deterministically ~37
    min in, in whichever test compiles next -- the traceback blames an
    innocent test).  Executables are only reachable through the jit
    caches once a module's closures are gone, so clearing per module
    caps the mapping count at the suite's largest single module.  Costs
    only cross-module cache hits, which are rare (configs differ)."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def testdata_dir():
    # Reference mock spectra are golden fixtures (read-only).
    return "/root/reference/testdata"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
