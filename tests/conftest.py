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
# NO persistent compilation cache on the CPU backend: this jaxlib's
# XLA:CPU AOT (de)serialization is unreliable — the loader logs "Target
# machine feature +prefer-no-scatter is not supported on the host
# machine ... could lead to execution errors such as SIGILL" even for
# entries written minutes earlier on the SAME host, and full-suite runs
# intermittently SEGFAULT inside compilation_cache.get/put_executable
# (reproduced 4x at tests/test_sharded_perceive.py setup, 2026-08-17).
# Cold compiles cost ~25-40 min per full suite run; crashes cost more.


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables at module boundaries.

    Full-suite runs (but no <=110-test subset) segfault inside
    backend_compile_and_load at the same late compile
    (tests/test_vector_env.py mrc_loss) — an XLA:CPU failure that only
    appears after ~200 compiled programs accumulate in one process
    (bisected 2026-08-17: every half-suite combination passes; two full
    runs crashed at the identical stack). Tests share almost no compiled
    programs across modules, so clearing per module caps resident
    executables at near-zero recompile cost."""
    yield
    import gc
    jax.clear_caches()
    gc.collect()
    log = os.environ.get("ETPNAV_RSS_LOG")
    if log:
        import resource
        with open(log, "a") as f:
            f.write(f"{resource.getrusage(resource.RUSAGE_SELF).ru_maxrss}\n")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "habitat: real habitat-sim smoke (skips when habitat is absent; "
        "run with `pytest -m habitat`)")
