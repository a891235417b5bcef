"""Test harness: force the CPU backend with 8 virtual devices.

This is the TPU-world answer to "test multi-node without a cluster"
(SURVEY §4): every sharding test runs over an 8-device host mesh via
``--xla_force_host_platform_device_count``, and no test touches real TPU
hardware (keeps the suite hermetic and fast).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# XLA CPU compiles dominate suite runtime (end-to-end/CLI tests build many
# small programs); a persistent cache makes re-runs ~3x faster.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("MCLSTEXP_TEST_JAX_CACHE", "/tmp/mclstexp_test_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
