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

# Persistent XLA compile cache for the suite (VERDICT r4 weak #4: ~185
# tests' CPU XLA compiles dominated the wall time and were re-paid every
# run). enable_persistent_compilation_cache deliberately skips CPU
# backends UNLESS given an explicit dir — the suite opts in with its own
# dir (separate from the TPU cache; CPU executables are keyed to host
# machine features, so a suite-private dir keeps any cross-machine
# staleness away from the training cache).
from pydreamer_tpu.tools import enable_persistent_compilation_cache  # noqa: E402

enable_persistent_compilation_cache(
    os.path.expanduser("~/.cache/pydreamer_tpu/jax_cache_cpu_tests"))
# The suite's many small-but-not-tiny jits (0.1-0.5 s each, hundreds of
# them) are worth caching too; the helper's 0.5 s default is tuned for
# TPU where entries are large.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
