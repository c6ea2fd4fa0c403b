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
# persistent compilation cache: repeat suite runs skip XLA compiles
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
