"""Test config: force JAX onto a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4).

Note: this environment pre-imports jax at interpreter startup, so backend
selection must go through jax.config.update (still before first backend
use), not environment variables.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")
# fp32 parity tests need true-fp32 matmuls (default precision truncates to
# bf16 on some backends); bf16 perf paths pass bf16 inputs and are unaffected.
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compilation cache: repeat suite runs skip XLA compiles.
# Keyed by a HOST FINGERPRINT: this environment migrates between machines
# with different CPU feature sets, and XLA:CPU AOT executables compiled
# on one host SEGFAULT when deserialized on another (observed: suite
# segfault in compilation_cache.get_executable_and_time after a host
# change; jax logs "Target machine feature +prefer-no-scatter is not
# supported on the host machine ... SIGILL" first).


def _host_fingerprint() -> str:
    import hashlib
    import platform
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    key = f"{platform.machine()}|{flags}"
    return hashlib.sha256(key.encode()).hexdigest()[:12]


_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache", _host_fingerprint())
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
