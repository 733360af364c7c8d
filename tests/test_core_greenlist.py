"""Greenlist sources: sizes, determinism, torch-parity, spec round-trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.core import (
    HashGreenlist,
    VQInfo,
    WatermarkSpec,
    build_table_torch_compat,
    make_greenlist,
)
from wmar_tpu.core.greenlist import greenlist_ids_torch_compat, pack_bool_rows
from wmar_tpu.core.spec import SeedStrategy, SplitStrategy


def make_spec(**kw):
    base = dict(
        vocab_size=1024,
        seed_strategy=SeedStrategy.LINEAR,
        split_strategy=SplitStrategy.RANDOM,
        context_size=1,
        delta=2.0,
        gamma=0.25,
    )
    base.update(kw)
    return WatermarkSpec(**base)


def test_spec_string_roundtrip():
    spec = make_spec(
        seed_strategy=SeedStrategy.LINEAR,
        split_strategy=SplitStrategy.RANDOM_STRATIFIED,
        delta=2.0,
        gamma=0.25,
    )
    s = str(spec)
    assert s == "linear-stratifiedrand-h=1-d=2.0-g=0.25"
    spec2 = WatermarkSpec.from_string(s, vocab_size=1024)
    assert spec2 == spec


def test_hash_greenlist_rate_and_determinism():
    spec = make_spec()
    gl = HashGreenlist(spec)
    keys = jnp.arange(64, dtype=jnp.int32)
    mask = np.asarray(gl.green_mask(keys))
    assert mask.shape == (64, 1024)
    # Per-context green fraction concentrates around gamma.
    rates = mask.mean(axis=1)
    assert abs(rates.mean() - spec.gamma) < 0.01
    assert rates.std() < 0.05
    # Deterministic.
    mask2 = np.asarray(gl.green_mask(keys))
    np.testing.assert_array_equal(mask, mask2)
    # Different keys give different lists.
    assert (mask[0] != mask[1]).any()


def test_hash_greenlist_lookup_matches_mask():
    spec = make_spec()
    gl = HashGreenlist(spec)
    keys = jnp.array([3, 17, 99], dtype=jnp.int32)
    mask = np.asarray(gl.green_mask(keys))
    targets = jnp.array([5, 800, 1023], dtype=jnp.int32)
    looked = np.asarray(gl.green_lookup(keys, targets))
    expect = mask[np.arange(3), np.asarray(targets)]
    np.testing.assert_array_equal(looked, expect)


def test_hash_greenlist_stratified_rates():
    rng = np.random.default_rng(0)
    alive = np.zeros(1024, dtype=bool)
    alive[rng.choice(1024, size=600, replace=False)] = True
    spec = make_spec(split_strategy=SplitStrategy.RANDOM_STRATIFIED)
    gl = HashGreenlist(spec, alive_mask=alive)
    keys = jnp.arange(256, dtype=jnp.int32)
    mask = np.asarray(gl.green_mask(keys))
    alive_rate = mask[:, alive].mean()
    # alive tokens should be green at ~gamma
    assert abs(alive_rate - spec.gamma) < 0.01
    # total greens per row ~ greenlist_size
    assert abs(mask.sum(axis=1).mean() - spec.greenlist_size) < 10


def test_fixed_strategy_exact_size():
    spec = make_spec(seed_strategy=SeedStrategy.FIXED, context_size=0)
    gl = HashGreenlist(spec)
    mask = np.asarray(gl.green_mask(jnp.array([0, 5], dtype=jnp.int32)))
    # Same mask regardless of key, exactly greenlist_size greens.
    np.testing.assert_array_equal(mask[0], mask[1])
    assert mask[0].sum() == spec.greenlist_size


def test_pack_bool_rows_roundtrip():
    rng = np.random.default_rng(1)
    mask = rng.random((7, 100)) < 0.3
    packed = pack_bool_rows(mask)
    assert packed.shape == (7, 4)
    unpacked = ((packed[:, :, None] >> np.arange(32, dtype=np.uint32)) & 1).reshape(7, -1)[:, :100]
    np.testing.assert_array_equal(unpacked.astype(bool), mask)


def test_table_greenlist_torch_parity():
    """TableGreenlist reproduces torch randperm greenlists bit-exactly."""
    torch = pytest.importorskip("torch")
    spec = make_spec(vocab_size=128, gamma=0.25)
    table = build_table_torch_compat(spec, max_context_sum=40)
    for key in [0, 7, 40]:
        seed = spec.seed_for_context_sum(key)
        rng = torch.Generator(device="cpu")
        rng.manual_seed(seed)
        perm = torch.randperm(128, generator=rng).numpy()
        expect = np.zeros(128, dtype=bool)
        expect[perm[: spec.greenlist_size]] = True
        got = np.asarray(table.green_mask(jnp.array([key], dtype=jnp.int32)))[0]
        np.testing.assert_array_equal(got, expect)
        # Lookup agrees with mask.
        t = jnp.arange(128, dtype=jnp.int32)
        k = jnp.full((128,), key, dtype=jnp.int32)
        np.testing.assert_array_equal(np.asarray(table.green_lookup(k, t)), expect)


def test_table_greenlist_stratified_parity():
    pytest.importorskip("torch")
    alive_ids = np.arange(0, 96)
    spec = make_spec(vocab_size=128, split_strategy=SplitStrategy.RANDOM_STRATIFIED)
    ids = greenlist_ids_torch_compat(spec, seed=spec.seed_for_context_sum(5), alive_ids=alive_ids)
    assert len(ids) == spec.greenlist_size
    n_green_alive = int(len(alive_ids) * spec.gamma)
    assert (ids[:n_green_alive] < 96).all()


def test_make_greenlist_factory():
    vq = VQInfo(vocab_size=256, alive_ids=np.arange(200))
    spec = make_spec(vocab_size=256, split_strategy=SplitStrategy.RANDOM_STRATIFIED)
    native = make_greenlist(spec, vq)
    assert isinstance(native, HashGreenlist)
    compat = make_greenlist(spec, vq, torch_compat=True)
    mask = np.asarray(compat.green_mask(jnp.array([3], dtype=jnp.int32)))
    assert mask.sum() == spec.greenlist_size


def test_clustering_greenlist():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(256, 16)).astype(np.float32)
    alive = np.sort(rng.choice(256, size=220, replace=False))
    spec = make_spec(
        vocab_size=256,
        seed_strategy=SeedStrategy.FIXED,
        split_strategy=SplitStrategy.CLUSTERING,
        context_size=0,
    )
    gl = make_greenlist(spec, VQInfo(vocab_size=256, alive_ids=alive, embedding=emb))
    mask = np.asarray(gl.green_mask(jnp.array([0], dtype=jnp.int32)))[0]
    # roughly half of alive + half of dead
    assert 0.3 < mask.mean() < 0.7


def test_fixed_greenlist_is_not_an_id_prefix():
    """Regression: a broadcasting bug scalarized the fixed-split hash scores,
    silently making the FIXED greenlist ids [0..gamma*V) (round 2 find)."""
    import numpy as np

    from wmar_tpu.core import HashGreenlist, WatermarkSpec
    from wmar_tpu.core.spec import SeedStrategy, SplitStrategy

    spec = WatermarkSpec(vocab_size=256, seed_strategy=SeedStrategy.FIXED,
                         split_strategy=SplitStrategy.RANDOM, context_size=0,
                         delta=2.0, gamma=0.25)
    mask = np.asarray(HashGreenlist(spec)._fixed_mask)
    assert mask.sum() == spec.greenlist_size
    prefix = np.zeros(256, bool)
    prefix[: spec.greenlist_size] = True
    assert not np.array_equal(mask, prefix), "fixed greenlist is an id prefix"
    # and it must depend on the salt
    spec2 = WatermarkSpec(vocab_size=256, seed_strategy=SeedStrategy.FIXED,
                          split_strategy=SplitStrategy.RANDOM, context_size=0,
                          delta=2.0, gamma=0.25, salt_key=12345)
    mask2 = np.asarray(HashGreenlist(spec2)._fixed_mask)
    assert not np.array_equal(mask, mask2)


def test_lazy_torch_compat_matches_dense_table():
    """LazyTorchCompatGreenlist.detect_host == device detect over the dense
    torch-compat table, and huge tables fail fast with a clear message."""
    import jax.numpy as jnp
    import numpy as np
    import pytest as _pytest

    from wmar_tpu.core import WatermarkSpec
    from wmar_tpu.core.detect import detect
    from wmar_tpu.core.greenlist import (
        LazyTorchCompatGreenlist,
        build_table_torch_compat,
    )
    from wmar_tpu.core.spec import SeedStrategy, SplitStrategy

    spec = WatermarkSpec(vocab_size=64, seed_strategy=SeedStrategy.LINEAR,
                         split_strategy=SplitStrategy.RANDOM, context_size=1,
                         delta=2.0, gamma=0.25)
    dense = build_table_torch_compat(spec)
    lazy = LazyTorchCompatGreenlist(spec, maxsize=16)
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 64, size=(3, 40)).astype(np.int32))
    p_dense = np.asarray(detect(spec, dense, codes))
    p_lazy = lazy.detect_host(np.asarray(codes))
    np.testing.assert_allclose(p_lazy, p_dense, rtol=1e-3, atol=1e-5)
    assert len(lazy._rows) <= 16  # LRU bound held

    big = WatermarkSpec(vocab_size=65536, seed_strategy=SeedStrategy.LINEAR,
                        split_strategy=SplitStrategy.RANDOM, context_size=1,
                        delta=2.0, gamma=0.25)
    with _pytest.raises(ValueError, match="LazyTorchCompatGreenlist"):
        build_table_torch_compat(big)
    # the lazy source itself works at 65k vocab
    lazy_big = LazyTorchCompatGreenlist(big, maxsize=8)
    p = lazy_big.detect_host(np.asarray(rng.integers(0, 65536, size=(1, 16))))
    assert 0.0 <= float(p[0]) <= 1.0
