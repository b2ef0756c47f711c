"""Test configuration: run all tests on a virtual 8-device CPU mesh so the
sharded code paths are exercised without TPU hardware (SURVEY §4: fake-mesh
testing via ``xla_force_host_platform_device_count``)."""

import os

# Hard-override: the session environment pins JAX_PLATFORMS to the real TPU
# tunnel; unit tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU plugin in every
# process and pins the platform; override back to CPU after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.devices()[0].platform == "cpu"


import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test (subprocess spawns)")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """XLA's CPU client segfaults on large compilations late in a long
    pytest process (reproduced on several heavy e2e modules once ~90 tests
    of compiled executables have accumulated); dropping the compilation
    caches between modules keeps peak compiler state bounded."""
    yield
    jax.clear_caches()
