"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

This is the framework's equivalent of the reference's "multi-node without a
cluster" testing stance (SURVEY §4): sharding/pjit paths are exercised on
host-only virtual devices, no TPU required.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The image's sitecustomize force-appends the TPU platform regardless of
# JAX_PLATFORMS; override it after import, before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.devices()[0].platform == "cpu", "tests must run on host CPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for mesh tests"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
