"""Test configuration: force an 8-virtual-device CPU JAX platform.

Multi-chip sharding tests run against a virtual mesh per SURVEY.md §4
(`xla_force_host_platform_device_count=8`). Must be set before jax import.
"""

import os

# Force (don't setdefault): the session env presets JAX_PLATFORMS to the
# TPU tunnel, which would give a 1-device mesh and break sharding tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
