"""Test environment: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin registers itself regardless of JAX_PLATFORMS; pin the
# default device to CPU so tests are deterministic and run on the virtual
# 8-device CPU mesh. Sharding tests build their Mesh from jax.devices('cpu').
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
