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
# Keyed by the host CPU fingerprint: XLA:CPU cache entries are AOT machine
# code whose key ignores the compile host's features, and a cache carried
# across hosts produced *different float numerics* (golden-e2e token flips
# + cpu_aot_loader feature-mismatch spam). See utils.host_machine_tag.
try:
    import sys as _sys

    _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if _repo not in _sys.path:
        _sys.path.insert(0, _repo)
    from wmar_tpu.utils import host_machine_tag

    _cache = os.path.join(_repo, ".jax_cache_tests", host_machine_tag())
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
