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

import hashlib  # noqa: E402
import platform  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _machine_tag() -> str:
    """Fingerprint the host CPU for the persistent-cache path: XLA:CPU AOT
    artifacts encode the COMPILE machine's vector features, and reusing a
    cache written on a different host silently computes WRONG numbers
    (observed: a stale cache made the reference-A/B forward loss come out
    3.170 vs the correct 3.002, with cpu_aot_loader feature-mismatch
    warnings). Key the cache by the CPU flags so each host gets its own."""
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((line for line in f if line.startswith("flags")), "")
    except OSError:  # non-Linux
        flags = platform.processor() or platform.machine()
    return hashlib.sha1(flags.encode()).hexdigest()[:10]


# XLA CPU compiles dominate suite runtime (end-to-end/CLI tests build many
# small programs); a persistent cache makes re-runs ~3x faster.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "MCLSTEXP_TEST_JAX_CACHE", f"/tmp/mclstexp_test_jax_cache_{_machine_tag()}"
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
