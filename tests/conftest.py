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

# persistent compile cache: the suite is dominated by XLA CPU compiles of
# tiny-config models; cached re-runs cut wall time several-fold. The dir is
# keyed by this host's CPU feature flags (same scheme as __graft_entry__'s
# dryrun child): XLA:CPU AOT blobs compiled on a different machine are
# unsafe to load ("could lead to SIGILL" — and a stale cache was implicated
# in in-process XLA compiler segfaults mid-suite), so an image-snapshotted
# /tmp or a host change must never replay them.


def _cpu_fingerprint() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    return hashlib.sha1(flags.encode()).hexdigest()[:10]


jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   f"/tmp/jax_cache_cpu_tests_{_cpu_fingerprint()}"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
