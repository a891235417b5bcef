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
    """Fingerprint host CPU + XLA build for the persistent-cache path:
    XLA:CPU AOT artifacts encode the COMPILE machine's vector features AND
    compiler tuning flags, and reusing a cache written under a different
    build silently computes WRONG numbers or livelocks (observed twice: a
    stale cache made the reference-A/B forward loss come out 3.170 vs the
    correct 3.002; a jaxlib upgrade changed the +prefer-no-scatter/-gather
    tuning features on an IDENTICAL CPU and the cached executables spun
    forever with cpu_aot_loader feature-mismatch warnings). Key the cache
    by CPU flags + jax/jaxlib versions so each (host, build) is its own."""
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((line for line in f if line.startswith("flags")), "")
    except OSError:  # non-Linux
        flags = platform.processor() or platform.machine()
    import jaxlib

    key = f"{flags}|jax={jax.__version__}|jaxlib={jaxlib.__version__}"
    return hashlib.sha1(key.encode()).hexdigest()[:10]


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
