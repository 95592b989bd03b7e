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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: preset-sized smoke tests (minutes on CPU)")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
