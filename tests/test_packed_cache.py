"""Packed-heads int8 KV cache + batch-blocked Pallas decode kernel.

The packed cache stores the same per-(token, head) absmax quantization as
QuantKVCache, only in the ``[L, B, T, H*D]`` layout the batch-blocked decode
kernel wants; dequantized values must therefore match bit-for-bit, and the
kernel (run in interpret mode here) must agree with the XLA decode-attention
path to bf16-matmul tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.engine.attention import cached_decode_attention, decode_attention
from wmar_tpu.engine.kvcache import KVCache, PackedQuantKVCache, QuantKVCache
from wmar_tpu.ops.flash_decode import packed_decode_attention_q8

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"

L, B, H, T, D = 2, 4, 4, 32, 16


def _filled_caches(seed=0, writes=5):
    """The same K/V stream written through both cache layouts."""
    rng = np.random.default_rng(seed)
    packed = PackedQuantKVCache.zeros(L, B, H, T, D)
    ref = QuantKVCache.zeros(L, B, H, T, D)
    for pos in range(writes):
        for li in range(L):
            k = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
            v = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
            packed = packed.write(li, pos, k, v)
            ref = ref.write(li, pos, k, v)
    return packed, ref


def test_packed_layer_matches_quant_cache_bitwise():
    packed, ref = _filled_caches()
    for li in range(L):
        kp, vp = packed.layer(li)
        kr, vr = ref.layer(li)
        np.testing.assert_array_equal(np.asarray(kp), np.asarray(kr))
        np.testing.assert_array_equal(np.asarray(vp), np.asarray(vr))


def test_packed_multitoken_write_matches_single_token_writes():
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.standard_normal((B, H, 3, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, 3, D)), jnp.float32)
    burst = PackedQuantKVCache.zeros(L, B, H, T, D).write(0, 2, k, v)
    single = PackedQuantKVCache.zeros(L, B, H, T, D)
    for i in range(3):
        single = single.write(0, 2 + i, k[:, :, i : i + 1], v[:, :, i : i + 1])
    np.testing.assert_array_equal(np.asarray(burst.kv), np.asarray(single.kv))
    np.testing.assert_array_equal(np.asarray(burst.scale), np.asarray(single.scale))


def _kernel(q, packed, layer, valid_len, **kw):
    return packed_decode_attention_q8(
        q, packed.kv, packed.scale, layer, valid_len, interpret=True, **kw)


@pytest.mark.parametrize("rows_per_block", [1, 2, 4])
def test_packed_kernel_matches_xla_decode(rows_per_block):
    packed, _ = _filled_caches(seed=2, writes=7)
    q = jnp.asarray(np.random.default_rng(3).standard_normal((B, H, 1, D)), jnp.float32)
    want = decode_attention(q, *packed.layer(0), valid_len=7)
    got = _kernel(q, packed, 0, 7, rows_per_block=rows_per_block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2, rtol=0)


@pytest.mark.parametrize("chunk_t", [8, 16, 32])
@pytest.mark.parametrize("valid_len", [3, 9, 17, 32])
def test_packed_kernel_chunked_matches_single_block(chunk_t, valid_len):
    """Online-softmax chunked path == single-block path == XLA, for lengths
    landing inside the first/middle/last chunk (the dynamic index map must
    elide chunks past valid_len without changing results)."""
    packed, _ = _filled_caches(seed=9, writes=T)
    q = jnp.asarray(np.random.default_rng(10).standard_normal((B, H, 1, D)), jnp.float32)
    want = decode_attention(q, *packed.layer(0), valid_len=valid_len)
    got = _kernel(q, packed, 0, valid_len, chunk_t=chunk_t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2, rtol=0)


def test_packed_kernel_respects_valid_len():
    """Slots past valid_len must not contribute even when they hold data;
    layer=1 also checks the static-layer block indexing."""
    packed, _ = _filled_caches(seed=4, writes=9)
    q = jnp.asarray(np.random.default_rng(5).standard_normal((B, H, 1, D)), jnp.float32)
    short = _kernel(q, packed, 1, 4)
    want = decode_attention(q, *packed.layer(1), valid_len=4)
    np.testing.assert_allclose(np.asarray(short), np.asarray(want), atol=2e-2, rtol=0)
    full = _kernel(q, packed, 1, 9)
    assert not np.allclose(np.asarray(short), np.asarray(full), atol=1e-3)


def test_cached_decode_attention_dispatch():
    """The dispatcher routes packed caches to the kernel and everything else
    to the XLA path, with identical results between the two cache layouts."""
    packed, ref = _filled_caches(seed=6)
    q = jnp.asarray(np.random.default_rng(7).standard_normal((B, H, 1, D)), jnp.float32)
    out_packed = cached_decode_attention(q, packed, 0, 5)
    out_ref = cached_decode_attention(q, ref, 0, 5)
    np.testing.assert_allclose(np.asarray(out_packed), np.asarray(out_ref), atol=2e-2, rtol=0)
    # burst path (t=2) falls back to XLA and still works on the packed cache
    q2 = jnp.asarray(np.random.default_rng(8).standard_normal((B, H, 2, D)), jnp.float32)
    out2 = cached_decode_attention(q2, packed, 0, 5)
    assert out2.shape == (B, H, 2, D)


def test_taming_gpt_decode_packed_vs_int8():
    """Taming GPT decode (the second packed-dispatch consumer): logits with
    a packed cache match the int8-cache XLA path."""
    from wmar_tpu.models.taming_gpt import GPTConfig, gpt_forward, init_gpt_params, prefill

    cfg = GPTConfig(vocab_size=32, block_size=24, n_layer=2, n_head=4, n_embd=32)
    params = init_gpt_params(jax.random.PRNGKey(0), cfg)
    cond = jnp.asarray(np.random.default_rng(0).integers(0, 32, (3, 2)), jnp.int32)
    outs = {}
    for cd in (jnp.int8, "packed"):
        logits, cache = prefill(params, cfg, cond, max_len=8, dtype=cd)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        step_logits, _ = gpt_forward(params, cfg, tok[:, None], cache, 2)
        outs[cd] = np.asarray(step_logits[:, -1])
    np.testing.assert_allclose(outs[jnp.int8], outs["packed"], atol=5e-2, rtol=0)


def test_kvcache_zeros_dispatches_packed():
    c = KVCache.zeros(L, B, H, T, D, dtype="packed")
    assert isinstance(c, PackedQuantKVCache)
    assert c.max_len == T and c.n_heads == H and c.head_dim == D


def _unzero_adaln(params, seed=9):
    """RAR uses adaLN-zero init, which makes the attention branch contribute
    NOTHING to logits at random init — any cache-quality agreement test
    would pass vacuously. Give the gates small random values so the cache
    actually flows into the outputs."""
    rng = np.random.default_rng(seed)
    out = dict(params)
    out["blocks"] = [
        {**blk, "adaln": {"w": jnp.asarray(
            rng.standard_normal(blk["adaln"]["w"].shape), jnp.float32) * 0.05,
            "b": blk["adaln"]["b"]}}
        for blk in params["blocks"]
    ]
    return out


def test_rar_decode_packed_vs_int8_cache():
    """End-to-end tiny RAR sampling: packed cache tokens == int8 cache tokens
    under greedy decode (same quantized values, same argmax)."""
    from wmar_tpu.models import GenParams, RARConfig, RarARMM, init_rar_params
    from wmar_tpu.models.maskgit_vqgan import MaskGitVQConfig, MaskGitVQGAN

    cfg = RARConfig(embed_dim=32, depth=2, num_heads=2, intermediate_size=64,
                    image_seq_len=16, codebook_size=32, num_classes=4)
    vq_cfg = MaskGitVQConfig(resolution=8, hidden_channels=32, channel_mult=(1, 2),
                             num_res_blocks=1, z_channels=16, n_embed=32, embed_dim=16)
    params = _unzero_adaln(init_rar_params(jax.random.PRNGKey(0), cfg))
    vq = MaskGitVQGAN(vq_cfg)
    vq_params = vq.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))
    gen = GenParams(temperature=0.0, guidance_scale=4.0)
    classes = np.array([0, 1, 2, 3])

    outs = {}
    for cd in (jnp.int8, "packed"):
        wrapper = RarARMM(params, cfg, vq_params, vq_cfg, cache_dtype=cd)
        outs[cd] = np.asarray(wrapper.sample(classes, gen, apply_watermark=False,
                                             rng=jax.random.PRNGKey(2)))
    # same quantized cache values; bf16 kernel matmuls vs f32 XLA may flip a
    # near-tie argmax occasionally, so require near-total agreement
    agree = (outs[jnp.int8] == outs["packed"]).mean()
    assert agree > 0.95, f"greedy agreement {agree}"


def test_packed4_kernel_matches_dequantized_xla():
    """int4 packed kernel == XLA attention over the SAME quantized values
    (layer() dequantizes the nibbles exactly, so tolerance is bf16-matmul
    level, not int4-noise level)."""
    from wmar_tpu.engine.kvcache import Packed4QuantKVCache
    from wmar_tpu.ops.flash_decode import packed4_decode_attention

    rng = np.random.default_rng(20)
    cache = Packed4QuantKVCache.zeros(L, B, H, T, D)
    for pos in range(6):
        for li in range(L):
            cache = cache.write(
                li, pos,
                jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32),
                jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32))
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    for li in range(L):
        want = decode_attention(q, *cache.layer(li), valid_len=6)
        got = packed4_decode_attention(q, cache.kv, cache.scale, li, 6, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2, rtol=0)


def test_packed4_quantization_noise_is_bounded():
    """int4 values reconstruct within absmax/7 of the originals."""
    from wmar_tpu.engine.kvcache import Packed4QuantKVCache

    rng = np.random.default_rng(21)
    x = rng.standard_normal((B, H, 3, D)).astype(np.float32)
    cache = Packed4QuantKVCache.zeros(1, B, H, T, D).write(
        0, 0, jnp.asarray(x), jnp.asarray(-x))
    k, v = cache.layer(0)
    k = np.asarray(k[:, :, :3], np.float32)
    v = np.asarray(v[:, :, :3], np.float32)
    step = np.abs(x).max(axis=-1, keepdims=True) / 7.0
    xt = x.transpose(0, 1, 2, 3)  # [B, H, t, D] already
    # rounding error <= step/2 plus bf16 rounding of the stored scale and
    # of the dequant product (~0.4% relative each)
    assert np.all(np.abs(k - xt) <= step * 0.55 + 1e-6)
    assert np.all(np.abs(v + xt) <= step * 0.55 + 1e-6)


def test_packed4_end_to_end_dispatch():
    from wmar_tpu.engine.kvcache import KVCache, Packed4QuantKVCache

    c = KVCache.zeros(L, B, H, T, D, dtype="packed4")
    assert isinstance(c, Packed4QuantKVCache)
    rng = np.random.default_rng(22)
    c = c.write(0, 0, jnp.asarray(rng.standard_normal((B, H, 2, D)), jnp.float32),
                jnp.asarray(rng.standard_normal((B, H, 2, D)), jnp.float32))
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    out = cached_decode_attention(q, c, 0, 2)
    assert out.shape == (B, H, 1, D) and bool(jnp.isfinite(out).all())


def test_rar_decode_packed4_greedy_agreement():
    """Quality proxy for the int4 cache: greedy tokens vs the f32 cache on a
    tiny RAR. int4 noise (absmax/7 per token) flips some near-tie argmaxes;
    the bulk must survive — this documents the measured agreement level."""
    from wmar_tpu.models import GenParams, RARConfig, RarARMM, init_rar_params
    from wmar_tpu.models.maskgit_vqgan import MaskGitVQConfig, MaskGitVQGAN

    cfg = RARConfig(embed_dim=32, depth=2, num_heads=2, intermediate_size=64,
                    image_seq_len=16, codebook_size=32, num_classes=4)
    vq_cfg = MaskGitVQConfig(resolution=8, hidden_channels=32, channel_mult=(1, 2),
                             num_res_blocks=1, z_channels=16, n_embed=32, embed_dim=16)
    params = _unzero_adaln(init_rar_params(jax.random.PRNGKey(0), cfg))
    vq = MaskGitVQGAN(vq_cfg)
    vq_params = vq.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))
    gen = GenParams(temperature=0.0, guidance_scale=4.0)
    classes = np.array([0, 1, 2, 3])
    outs = {}
    for cd in (jnp.float32, "packed4"):
        wrapper = RarARMM(params, cfg, vq_params, vq_cfg, cache_dtype=cd)
        outs[cd] = np.asarray(wrapper.sample(classes, gen, apply_watermark=False,
                                             rng=jax.random.PRNGKey(2)))
    agree = (outs[jnp.float32] == outs["packed4"]).mean()
    assert agree > 0.7, f"int4 greedy agreement collapsed: {agree}"


TL = 1024  # long-context length: activates the chunked default + mask path


def _long_cache(seed=30, writes=12):
    rng = np.random.default_rng(seed)
    cache = PackedQuantKVCache.zeros(1, B, H, TL, D)
    for pos in range(writes):
        cache = cache.write(
            0, pos,
            jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32))
    return cache


def test_packed_chunked_start_mask_parity():
    """start (ragged left padding) and key_mask (per-row slot validity)
    through the chunked kernel must match the XLA path."""
    cache = _long_cache()
    rng = np.random.default_rng(31)
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    start = jnp.asarray([0, 2, 5, 1], jnp.int32)
    km = jnp.asarray(rng.integers(0, 2, (B, TL)).astype(bool))
    km = km.at[:, :12].set(True).at[:, 3].set(False)
    want = decode_attention(q, *cache.layer(0), valid_len=12, start=start, key_mask=km)
    got = packed_decode_attention_q8(
        q, cache.kv, cache.scale, 0, 12, start=start, key_mask=km,
        chunk_t=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2, rtol=0)
    # and via the dispatcher (max_len >= 1024 allows the masked route)
    got2 = cached_decode_attention(q, cache, 0, 12, start=start, key_mask=km)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), atol=2e-2, rtol=0)


def test_packed4_chunked_start_mask_parity():
    """packed4 twin of the q8 chunked mask test: start + key_mask through
    the int4 chunked kernel must match the XLA dequant path. This is the
    Chameleon serving route (every decode step passes ragged starts), so
    masked packed4 MUST run in-kernel — the XLA fallback materializes bf16
    K/V per layer step, which faults the tunneled device at 7B shapes."""
    from wmar_tpu.engine.kvcache import Packed4QuantKVCache
    from wmar_tpu.ops.flash_decode import packed4_decode_attention

    rng = np.random.default_rng(33)
    cache = Packed4QuantKVCache.zeros(1, B, H, TL, D)
    for pos in range(12):
        cache = cache.write(
            0, pos,
            jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32))
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    start = jnp.asarray([0, 2, 5, 1], jnp.int32)
    km = jnp.asarray(rng.integers(0, 2, (B, TL)).astype(bool))
    km = km.at[:, :12].set(True).at[:, 3].set(False)
    want = decode_attention(q, *cache.layer(0), valid_len=12, start=start, key_mask=km)
    got = packed4_decode_attention(
        q, cache.kv, cache.scale, 0, 12, start=start, key_mask=km,
        chunk_t=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2, rtol=0)
    # start-only (the Chameleon step_fn signature) and the dispatcher route
    got2 = packed4_decode_attention(
        q, cache.kv, cache.scale, 0, 12, start=start, chunk_t=128, interpret=True)
    want2 = decode_attention(q, *cache.layer(0), valid_len=12, start=start)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=2e-2, rtol=0)
    got3 = cached_decode_attention(q, cache, 0, 12, start=start, key_mask=km)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want), atol=2e-2, rtol=0)


def test_llama_decode_with_packed4_long_cache():
    """llama_forward with a packed4 long cache (the masked chunked kernel
    route) tracks the float cache's logits to int4-noise tolerance."""
    from wmar_tpu.models.llama import LlamaConfig, init_llama_params, llama_forward

    cfg = LlamaConfig(dim=32, n_layers=2, n_heads=4, vocab_size=64,
                      multiple_of=32, qk_normalization=True)
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(np.random.default_rng(34).integers(0, 64, (2, 6)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(6)[None], (2, 6))
    start = jnp.zeros((2,), jnp.int32)
    outs = {}
    for cd in (jnp.float32, "packed4"):
        cache = KVCache.zeros(cfg.n_layers, 2, cfg.n_heads, TL, cfg.head_dim, cd)
        _, cache = llama_forward(params, cfg, tokens, cache, 0, positions, start=start)
        nxt = jnp.zeros((2, 1), jnp.int32)
        logits, _ = llama_forward(params, cfg, nxt, cache, 6,
                                  jnp.full((2, 1), 6, jnp.int32), start=start)
        outs[cd] = np.asarray(logits[:, 0])
    np.testing.assert_allclose(outs[jnp.float32], outs["packed4"], atol=0.35, rtol=0)


def test_llama_decode_with_packed_cache():
    """llama_forward with a packed long cache routes through the packed
    chunked kernel and matches the QuantKVCache XLA path."""
    from wmar_tpu.models.llama import LlamaConfig, init_llama_params, llama_forward

    cfg = LlamaConfig(dim=32, n_layers=2, n_heads=4, vocab_size=64,
                      multiple_of=32, qk_normalization=True)
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(np.random.default_rng(32).integers(0, 64, (2, 6)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(6)[None], (2, 6))
    outs = {}
    for cd in (jnp.int8, "packed"):
        cache = KVCache.zeros(cfg.n_layers, 2, cfg.n_heads, TL, cfg.head_dim, cd)
        _, cache = llama_forward(params, cfg, tokens, cache, 0, positions)
        nxt = jnp.zeros((2, 1), jnp.int32)
        logits, _ = llama_forward(params, cfg, nxt, cache, 6,
                                  jnp.full((2, 1), 6, jnp.int32))
        outs[cd] = np.asarray(logits[:, 0])
    np.testing.assert_allclose(outs[jnp.int8], outs["packed"], atol=5e-2, rtol=0)
