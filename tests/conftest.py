"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), the TPU-native
substitute for multi-node tests without a real cluster (SURVEY.md §4).
Must run before jax initializes its backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (one real TPU chip) via
# sitecustomize; the env var is already consumed by the time conftest runs,
# so override through the config API instead.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
