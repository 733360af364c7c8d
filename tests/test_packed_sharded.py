"""Multi-chip packed-cache decode: grouped TP layout + shard_map kernel.

Round-2 verdict / ROADMAP item: the packed int8 cache's combined K|V lane
axis could not tensor-parallel shard, so multi-chip serving fell back to the
XLA path. The grouped layout (``tp_groups``) orders lanes ``[K_g0 | V_g0 |
K_g1 | ...]`` so a tp-sharded lane axis hands each chip a valid local packed
cache, and ``sharded_packed_decode_attention`` runs the unchanged kernel
per-chip under ``shard_map``. These tests run on the 8-device virtual CPU
mesh (conftest) with the kernel in interpret mode — the same dispatch path
real TPU meshes take.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.engine.attention import cached_decode_attention, decode_attention
from wmar_tpu.engine.kvcache import (
    KVCache,
    Packed4QuantKVCache,
    PackedQuantKVCache,
    QuantKVCache,
)
from wmar_tpu.parallel import make_mesh

L, B, H, T, D = 2, 4, 8, 32, 16


def _fill(cache, ref=None, seed=0, writes=6):
    rng = np.random.default_rng(seed)
    for pos in range(writes):
        for li in range(cache.kv.shape[0] if hasattr(cache, "kv") else L):
            k = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
            v = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
            cache = cache.write(li, pos, k, v)
            if ref is not None:
                ref = ref.write(li, pos, k, v)
    return (cache, ref) if ref is not None else cache


@pytest.mark.parametrize("tp", [2, 4])
def test_grouped_layout_layer_bitwise(tp):
    """tp_groups reorders storage only: dequantized values must equal the
    plain QuantKVCache bit-for-bit."""
    mesh = make_mesh(dp=8 // tp, tp=tp)
    grouped = PackedQuantKVCache.zeros(L, B, H, T, D, mesh=mesh, tp_axis="tp")
    assert grouped.tp_groups == tp
    grouped, ref = _fill(grouped, QuantKVCache.zeros(L, B, H, T, D))
    for li in range(L):
        kg, vg = grouped.layer(li)
        kr, vr = ref.layer(li)
        np.testing.assert_array_equal(np.asarray(kg), np.asarray(kr))
        np.testing.assert_array_equal(np.asarray(vg), np.asarray(vr))


def test_grouped_lane_slice_is_local_packed_cache():
    """The defining property: shard i's lane slice of a grouped cache equals
    the plain packed cache built from shard i's heads alone."""
    tp = 4
    hl = H // tp
    mesh = make_mesh(dp=2, tp=tp)
    grouped = PackedQuantKVCache.zeros(L, B, H, T, D, mesh=mesh, tp_axis="tp")
    rng = np.random.default_rng(3)
    k = jnp.asarray(rng.standard_normal((B, H, 2, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, 2, D)), jnp.float32)
    grouped = grouped.write(0, 0, k, v)
    lanes = 2 * hl * D
    for i in range(tp):
        local = PackedQuantKVCache.zeros(L, B, hl, T, D).write(
            0, 0, k[:, i * hl:(i + 1) * hl], v[:, i * hl:(i + 1) * hl])
        np.testing.assert_array_equal(
            np.asarray(grouped.kv[:, :, :, i * lanes:(i + 1) * lanes]),
            np.asarray(local.kv))
        np.testing.assert_array_equal(
            np.asarray(grouped.scale[:, :, i * 2 * hl:(i + 1) * 2 * hl]),
            np.asarray(local.scale))


def test_packed4_grouped_layer_matches_plain():
    mesh = make_mesh(dp=2, tp=4)
    grouped = Packed4QuantKVCache.zeros(L, B, H, T, D, mesh=mesh, tp_axis="tp")
    plain = Packed4QuantKVCache.zeros(L, B, H, T, D)
    grouped, plain = _fill(grouped, plain, seed=5)
    for li in range(L):
        kg, vg = grouped.layer(li)
        kp, vp = plain.layer(li)
        np.testing.assert_array_equal(np.asarray(kg), np.asarray(kp))
        np.testing.assert_array_equal(np.asarray(vg), np.asarray(vp))


@pytest.mark.parametrize("axes", [
    {"dp_axis": "dp"},
    {"tp_axis": "tp"},
    {"dp_axis": "dp", "tp_axis": "tp"},
])
def test_sharded_dispatch_matches_xla(axes):
    """cached_decode_attention on a mesh-carrying packed cache routes through
    shard_map and matches the single-device XLA path."""
    mesh = make_mesh(dp=2, tp=4)
    cache = PackedQuantKVCache.zeros(L, B, H, T, D, mesh=mesh, **axes)
    cache, ref = _fill(cache, QuantKVCache.zeros(L, B, H, T, D), seed=7)
    q = jnp.asarray(np.random.default_rng(8).standard_normal((B, H, 1, D)),
                    jnp.float32)
    want = decode_attention(q, *ref.layer(1), valid_len=6)
    got = cached_decode_attention(q, cache, 1, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2,
                               rtol=0)


def test_sharded_dispatch_packed4():
    mesh = make_mesh(dp=2, tp=4)
    cache = Packed4QuantKVCache.zeros(L, B, H, T, D, mesh=mesh,
                                      dp_axis="dp", tp_axis="tp")
    cache = _fill(cache, seed=9)
    q = jnp.asarray(np.random.default_rng(10).standard_normal((B, H, 1, D)),
                    jnp.float32)
    want = decode_attention(q, *cache.layer(0), valid_len=6)
    got = cached_decode_attention(q, cache, 0, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2,
                               rtol=0)


def test_sharded_chunked_start_key_mask():
    """The Chameleon fused-interleaved case: long cache (chunked kernel) with
    per-row start + key_mask, tp-sharded — matches the XLA reference."""
    tl = 1024
    mesh = make_mesh(dp=2, tp=4)
    cache = PackedQuantKVCache.zeros(1, B, H, tl, D, mesh=mesh,
                                     dp_axis="dp", tp_axis="tp")
    rng = np.random.default_rng(11)
    for pos in range(10):
        cache = cache.write(
            0, pos, jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32))
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    start = jnp.asarray([0, 2, 1, 3], jnp.int32)
    km = jnp.asarray(rng.integers(0, 2, (B, tl)).astype(bool)).at[:, :2].set(True)
    want = decode_attention(q, *cache.layer(0), valid_len=10, start=start,
                            key_mask=km)
    got = cached_decode_attention(q, cache, 0, 10, start=start, key_mask=km)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2,
                               rtol=0)


def test_grouped_without_mesh_falls_back_to_xla():
    """A grouped-layout cache whose mesh context is missing must not reach
    the single-chip kernel (its [K|V] scale-row assumption would silently
    read V scales as K) — the dispatcher takes the XLA path instead."""
    grouped = PackedQuantKVCache.zeros(L, B, H, T, D).replace(tp_groups=4)
    grouped, ref = _fill(grouped, QuantKVCache.zeros(L, B, H, T, D), seed=13)
    q = jnp.asarray(np.random.default_rng(14).standard_normal((B, H, 1, D)),
                    jnp.float32)
    want = decode_attention(q, *ref.layer(0), valid_len=6)
    got = cached_decode_attention(q, grouped, 0, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2,
                               rtol=0)


def test_llama_decode_tp_packed_matches_replicated():
    """llama_forward decode step: tp-sharded packed cache == single-device
    packed cache, inside jit (the serving configuration)."""
    from wmar_tpu.models.llama import LlamaConfig, init_llama_params, llama_forward

    tl = 1024  # long cache: the chunked kernel path (Chameleon shape class)
    cfg = LlamaConfig(dim=64, n_layers=2, n_heads=8, vocab_size=64,
                      multiple_of=32, qk_normalization=True)
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(np.random.default_rng(20).integers(0, 64, (2, 6)),
                         jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(6)[None], (2, 6))
    mesh = make_mesh(dp=1, tp=8)

    outs = {}
    for name, kw in (("single", {}),
                     ("tp", dict(mesh=mesh, tp_axis="tp"))):
        cache = KVCache.zeros(cfg.n_layers, 2, cfg.n_heads, tl, cfg.head_dim,
                              "packed", **kw)
        _, cache = llama_forward(params, cfg, tokens, cache, 0, positions)
        nxt = jnp.zeros((2, 1), jnp.int32)

        @jax.jit
        def step(cache):
            logits, _ = llama_forward(params, cfg, nxt, cache, 6,
                                      jnp.full((2, 1), 6, jnp.int32))
            return logits

        outs[name] = np.asarray(step(cache)[:, 0])
    np.testing.assert_allclose(outs["tp"], outs["single"], atol=5e-2, rtol=0)
