"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes its backends. TPU kernels are
exercised in Pallas interpret mode on CPU; the real-TPU benchmark path is
driven by bench.py instead of the test suite.
"""

import os

# Force CPU: the ambient environment presets JAX_PLATFORMS to the TPU
# tunnel backend, and the suite must run TPU-free (virtual device mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
