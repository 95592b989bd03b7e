"""Shared example-parameter selection."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

# Honor JAX_PLATFORMS even when a sitecustomize imported jax before us
# (jax.config reads the env var at import time, so set it via the config).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import liberate_tpu  # noqa: E402


def example_params(argv):
    """Preset name from argv, else a small CPU-friendly configuration."""
    if len(argv) > 1:
        p = dict(liberate_tpu.params[argv[1]])
        p.pop("mesh_shape", None)
        return p
    return dict(logN=10, scale_bits=30, num_scales=6, num_special_primes=2,
                is_secured=False, seed=1)
