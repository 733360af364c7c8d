"""Test config: force an 8-device virtual CPU mesh.

Mirrors the reference's approach of exercising distributed code paths
without real multi-device hardware (it used NCCL THREAD workers); we use
XLA's host-platform device virtualization so mesh/sharding code runs in CI.

The environment may pin ``JAX_PLATFORMS`` to a TPU plugin at interpreter
start (sitecustomize), so we override via ``jax.config`` — this must happen
before any backend is initialized, i.e. before tests import model code.
"""

import os

# Drop the tunneled-TPU pool env BEFORE jax import: the axon plugin's
# channel setup can block indefinitely at import when another process
# (e.g. a bench) holds the single tunneled chip — observed as a pytest
# hang in collection with ~0 CPU time. Tests always run on the CPU mesh.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: repeat suite runs skip most XLA compiles.
try:
    os.makedirs("/root/repo/.jax_cache_tests", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tests")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
