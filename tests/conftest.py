"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must force the CPU platform before jax initializes its backends. Setting
the JAX_PLATFORMS env var is NOT enough here: the environment's
sitecustomize imports jax at interpreter start (so jax.config has already
read JAX_PLATFORMS=<tpu tunnel>); the working override is
jax.config.update after import but before first backend use. TPU kernels
are exercised in Pallas interpret mode on CPU; the real-TPU benchmark path
is driven by bench.py instead of the test suite.
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
assert jax.devices()[0].platform == "cpu", (
    "test suite must not touch the TPU tunnel"
)
assert len(jax.devices()) == 8, "expected the 8-device virtual CPU mesh"

# Persist CPU XLA executables across suite runs. The engine deliberately
# does NOT enable this for the CPU backend (cache entries are
# machine-feature-sensitive), but the test suite always reruns on the
# same host, and the per-level engine program compiles dominate suite
# wall time (~25 min cold). Cache key = optimized HLO, so identical
# programs from different engine instances and different test files
# dedupe too. Cold run builds the cache; warm reruns are minutes.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".xla_test_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: preset-sized smoke tests (minutes on CPU)")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (preset-sized CPU smoke, ~minutes each)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip_slow = pytest.mark.skip(
        reason="slow: pass --runslow (or RUN_SLOW=1) to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)


# One engine instance shared by test_engine.py and test_engine_math.py:
# per-level program tracing dominates suite wall time on the CPU backend,
# and with a single instance every level's mult/switch/rescale program
# traces and compiles exactly once for both files.
@pytest.fixture(scope="session")
def shared_eng():
    import liberate_tpu
    return liberate_tpu.CkksEngine(
        logN=8, scale_bits=30, num_scales=8,
        num_special_primes=2, is_secured=False, seed=20260816)


@pytest.fixture(scope="session")
def shared_keys(shared_eng):
    sk = shared_eng.create_secret_key()
    pk = shared_eng.create_public_key(sk)
    evk = shared_eng.create_evk(sk)
    return sk, pk, evk
