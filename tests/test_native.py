"""C++ native scorer == JAX detector, and fast."""

import numpy as np
import pytest

from wmar_tpu.core import HashGreenlist, WatermarkSpec, build_table_torch_compat
from wmar_tpu.core.detect import score_codes
from wmar_tpu.core.spec import SeedStrategy, SplitStrategy
from wmar_tpu.native import available, detect_native, score_codes_native

pytestmark = pytest.mark.skipif(not available(), reason="no C++ toolchain")


def make_spec(**kw):
    base = dict(
        vocab_size=256,
        seed_strategy=SeedStrategy.LINEAR,
        split_strategy=SplitStrategy.RANDOM,
        context_size=1,
        delta=2.0,
        gamma=0.25,
        spatial_dim=8,
    )
    base.update(kw)
    return WatermarkSpec(**base)


@pytest.mark.parametrize("strategy,h", [
    (SeedStrategy.LINEAR, 1), (SeedStrategy.LINEAR, 2),
    (SeedStrategy.SPATIAL, 1), (SeedStrategy.SPATIAL, 3),
    (SeedStrategy.FIXED, 1),
])
def test_native_matches_jax_hash_greenlist(strategy, h, rng):
    import jax.numpy as jnp

    spec = make_spec(seed_strategy=strategy, context_size=h)
    gl = HashGreenlist(spec)
    codes = rng.integers(0, 256, size=(4, 64)).astype(np.int32)
    ng_n, ns_n = score_codes_native(spec, gl, codes)
    for b in range(4):
        ng_j, ns_j = score_codes(spec, gl, jnp.asarray(codes[b]))
        assert int(ng_j) == ng_n[b], (strategy, h, b)
        assert int(ns_j) == ns_n[b]


def test_native_matches_jax_table_greenlist(rng):
    import jax.numpy as jnp

    spec = make_spec(vocab_size=64, context_size=1)
    gl = build_table_torch_compat(spec)
    codes = rng.integers(0, 64, size=(3, 32)).astype(np.int32)
    ng_n, ns_n = score_codes_native(spec, gl, codes)
    for b in range(3):
        ng_j, ns_j = score_codes(spec, gl, jnp.asarray(codes[b]))
        assert int(ng_j) == ng_n[b]
        assert int(ns_j) == ns_n[b]


def test_native_detect_pvalues(rng):
    spec = make_spec()
    gl = HashGreenlist(spec)
    codes = rng.integers(0, 256, size=(8, 128)).astype(np.int32)
    p = detect_native(spec, gl, codes)
    assert p.shape == (8,)
    assert ((p >= 0) & (p <= 1)).all()


def test_native_throughput(rng):
    """The native scorer handles analyzer-scale batches quickly."""
    import time

    spec = make_spec(vocab_size=16384)
    gl = HashGreenlist(spec)
    codes = rng.integers(0, 16384, size=(200, 256)).astype(np.int32)
    t0 = time.time()
    detect_native(spec, gl, codes)
    dt = time.time() - t0
    assert dt < 2.0, f"native scorer too slow: {dt:.2f}s for 200 images"


@pytest.mark.parametrize("strategy,h", [
    (SeedStrategy.LINEAR, 1), (SeedStrategy.LINEAR, 2),
    (SeedStrategy.SPATIAL, 1), (SeedStrategy.SPATIAL, 3),
    (SeedStrategy.FIXED, 0), (SeedStrategy.FIXED, 1),
])
def test_native_keymap_matches_dense_torch_compat(strategy, h, rng):
    """Lazy torch-compat scoring via the C++ keymap kernel == device counts
    over the dense torch-compat table (VERDICT r2 #6 cross-check)."""
    import jax.numpy as jnp

    from wmar_tpu.core.greenlist import LazyTorchCompatGreenlist

    spec = make_spec(vocab_size=64, seed_strategy=strategy, context_size=h,
                     spatial_dim=8)
    lazy = LazyTorchCompatGreenlist(spec)
    dense = build_table_torch_compat(spec)
    codes = rng.integers(0, 64, size=(4, 64)).astype(np.int32)
    ng_n, ns_n = score_codes_native(spec, lazy, codes)
    for b in range(4):
        ng_j, ns_j = score_codes(spec, dense, jnp.asarray(codes[b]))
        assert int(ng_j) == ng_n[b], (strategy, h, b)
        assert int(ns_j) == ns_n[b], (strategy, h, b)


def test_lazy_detect_host_native_equals_python_fallback(rng, monkeypatch):
    """detect_host: native path == vectorized numpy fallback, incl. at a
    Chameleon-scale vocab where no dense table can exist."""
    from wmar_tpu import native
    from wmar_tpu.core.greenlist import LazyTorchCompatGreenlist

    spec = make_spec(vocab_size=65536, context_size=1)
    codes = rng.integers(0, 65536, size=(3, 48))
    lazy = LazyTorchCompatGreenlist(spec)
    p_native = lazy.detect_host(codes)
    monkeypatch.setattr(native, "available", lambda: False)
    p_py = LazyTorchCompatGreenlist(spec).detect_host(codes)
    np.testing.assert_allclose(p_native, p_py, rtol=1e-12)
