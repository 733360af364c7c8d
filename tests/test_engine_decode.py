"""Decode engine: cache-vs-full-forward equivalence, watermark fusion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.core import HashGreenlist, WatermarkSpec, detect
from wmar_tpu.core.spec import SeedStrategy, SplitStrategy
from wmar_tpu.engine import KVCache, SamplerConfig, WatermarkRuntime, decode_tokens
from wmar_tpu.engine.attention import decode_attention, prefill_attention
from wmar_tpu.models.taming_gpt import (
    GPTConfig,
    gpt_forward,
    init_gpt_params,
    make_step_fn,
    prefill,
)

CFG = GPTConfig(vocab_size=64, block_size=40, n_layer=2, n_head=2, n_embd=32)


@pytest.fixture(scope="module")
def gpt():
    params = init_gpt_params(jax.random.PRNGKey(0), CFG)
    return params


def test_prefill_vs_decode_attention_agree(rng):
    b, h, t, d = 2, 3, 8, 16
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    full = prefill_attention(q, k, v, causal=True)
    # Pad cache to 12 and attend the last query alone
    pad = jnp.zeros((b, h, 4, d), dtype=jnp.float32)
    k_pad = jnp.concatenate([k, pad], axis=2)
    v_pad = jnp.concatenate([v, pad], axis=2)
    last = decode_attention(q[:, :, -1:], k_pad, v_pad, jnp.int32(t))
    np.testing.assert_allclose(np.asarray(last), np.asarray(full[:, :, -1:]), rtol=2e-5, atol=2e-5)


def test_cached_decode_matches_full_forward(gpt):
    """Token-by-token cached forward == one full causal forward."""
    params = gpt
    tokens = jnp.asarray(np.random.default_rng(1).integers(0, 64, size=(2, 10)))
    full_logits, _ = gpt_forward(params, CFG, tokens, cache=None)

    cache = KVCache.zeros(CFG.n_layer, 2, CFG.n_head, 16, CFG.head_dim)
    step_logits = []
    for i in range(10):
        lg, cache = gpt_forward(params, CFG, tokens[:, i : i + 1], cache, i)
        step_logits.append(lg[:, 0])
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(step_logits), np.asarray(full_logits), rtol=2e-4, atol=2e-4)


def test_prefill_burst_matches_full_forward(gpt):
    params = gpt
    tokens = jnp.asarray(np.random.default_rng(2).integers(0, 64, size=(2, 6)))
    full_logits, _ = gpt_forward(params, CFG, tokens, cache=None)
    cache = KVCache.zeros(CFG.n_layer, 2, CFG.n_head, 16, CFG.head_dim)
    burst_logits, cache = gpt_forward(params, CFG, tokens, cache, 0)
    np.testing.assert_allclose(np.asarray(burst_logits), np.asarray(full_logits), rtol=2e-4, atol=2e-4)


def test_decode_tokens_shapes_and_determinism(gpt):
    params = gpt
    cond = jnp.array([[3], [5]], dtype=jnp.int32)
    init_logits, cache = prefill(params, CFG, cond, max_len=40)
    step_fn = make_step_fn(params, CFG, cond_len=1)
    sampler = SamplerConfig(temperature=1.0, top_k=20, top_p=0.9)
    toks1, _ = decode_tokens(step_fn, cache, init_logits, 16, jax.random.PRNGKey(7), sampler, cond_tokens=cond)
    toks2, _ = decode_tokens(step_fn, cache, init_logits, 16, jax.random.PRNGKey(7), sampler, cond_tokens=cond)
    assert toks1.shape == (2, 16)
    np.testing.assert_array_equal(np.asarray(toks1), np.asarray(toks2))
    toks3, _ = decode_tokens(step_fn, cache, init_logits, 16, jax.random.PRNGKey(8), sampler, cond_tokens=cond)
    assert (np.asarray(toks1) != np.asarray(toks3)).any()


def test_decode_with_watermark_detects(gpt):
    """Generating with a strong watermark must yield detectable codes."""
    params = gpt
    spec = WatermarkSpec(
        vocab_size=64,
        seed_strategy=SeedStrategy.LINEAR,
        split_strategy=SplitStrategy.RANDOM,
        context_size=1,
        delta=8.0,
        gamma=0.25,
    )
    gl = HashGreenlist(spec)
    wm = WatermarkRuntime(spec, gl)
    cond = jnp.array([[3], [5], [7], [9]], dtype=jnp.int32)
    init_logits, cache = prefill(params, CFG, cond, max_len=40)
    step_fn = make_step_fn(params, CFG, cond_len=1)
    sampler = SamplerConfig(temperature=1.0)

    f = jax.jit(
        lambda c, lg, k: decode_tokens(step_fn, c, lg, 32, k, sampler, watermark=wm, cond_tokens=cond)
    )
    toks_wm, _ = f(cache, init_logits, jax.random.PRNGKey(0))
    toks_plain, _ = decode_tokens(step_fn, cache, init_logits, 32, jax.random.PRNGKey(0), sampler, cond_tokens=cond)

    p_wm = np.asarray(detect(spec, gl, toks_wm))
    p_plain = np.asarray(detect(spec, gl, toks_plain))
    assert (p_wm < 1e-3).all(), p_wm
    assert p_plain.mean() > 1e-3, p_plain


def test_greedy_decode_reproducible_across_jit(gpt):
    """Greedy decode is invariant to jit and batch composition."""
    params = gpt
    cond = jnp.array([[3], [9]], dtype=jnp.int32)
    init_logits, cache = prefill(params, CFG, cond, max_len=40)
    step_fn = make_step_fn(params, CFG, cond_len=1)
    sampler = SamplerConfig(greedy=True)
    toks_eager, _ = decode_tokens(step_fn, cache, init_logits, 12, jax.random.PRNGKey(0), sampler)
    toks_jit, _ = jax.jit(
        lambda c, lg: decode_tokens(step_fn, c, lg, 12, jax.random.PRNGKey(0), sampler)
    )(cache, init_logits)
    np.testing.assert_array_equal(np.asarray(toks_eager), np.asarray(toks_jit))


class TestQuantKVCache:
    """int8 KV cache: the serving-path bandwidth lever (PERFORMANCE.md)."""

    def test_zeros_dispatch_and_roundtrip(self):
        from wmar_tpu.engine.kvcache import KVCache, QuantKVCache

        c = KVCache.zeros(1, 2, 4, 8, 16, dtype=jnp.int8)
        assert isinstance(c, QuantKVCache)
        rng = np.random.default_rng(0)
        k_new = jnp.asarray(rng.standard_normal((2, 4, 3, 16)).astype(np.float32))
        v_new = jnp.asarray(2.5 * rng.standard_normal((2, 4, 3, 16)).astype(np.float32))
        c = c.write(0, 2, k_new, v_new)
        k, v = c.layer(0)
        assert k.dtype == jnp.bfloat16
        for got, want in ((k, k_new), (v, v_new)):
            err = np.abs(np.asarray(got[:, :, 2:5], np.float32) - np.asarray(want))
            rel = err.max() / np.abs(np.asarray(want)).max()
            assert rel < 0.01, rel
        # untouched slots stay zero
        assert np.asarray(k[:, :, :2]).max() == 0.0

    def test_decode_attention_close_to_float_cache(self):
        from wmar_tpu.engine.attention import decode_attention
        from wmar_tpu.engine.kvcache import KVCache

        rng = np.random.default_rng(1)
        cf = KVCache.zeros(1, 2, 4, 8, 16, dtype=jnp.float32)
        cq = KVCache.zeros(1, 2, 4, 8, 16, dtype=jnp.int8)
        for t in range(6):
            k_new = jnp.asarray(rng.standard_normal((2, 4, 1, 16)).astype(np.float32))
            v_new = jnp.asarray(rng.standard_normal((2, 4, 1, 16)).astype(np.float32))
            cf = cf.write(0, t, k_new, v_new)
            cq = cq.write(0, t, k_new, v_new)
        q = jnp.asarray(rng.standard_normal((2, 4, 1, 16)).astype(np.float32))
        of = decode_attention(q, *cf.layer(0), jnp.int32(6))
        oq = decode_attention(q, *cq.layer(0), jnp.int32(6))
        np.testing.assert_allclose(np.asarray(of, np.float32),
                                   np.asarray(oq, np.float32), atol=0.05)

    def test_rar_greedy_matches_float_cache(self):
        from wmar_tpu.models import RARConfig, RARSampler, init_rar_params

        cfg = RARConfig(embed_dim=64, depth=2, num_heads=2, intermediate_size=128,
                        image_seq_len=16, codebook_size=64, num_classes=10)
        params = init_rar_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        cids = jnp.arange(2, dtype=jnp.int32)

        def gen(cache_dtype):
            s = RARSampler(params, cfg, cids, guidance_scale=4.0, cache_dtype=cache_dtype)
            _, cache = s.prefill()
            prev = jnp.zeros((2,), jnp.int32)
            toks = []
            for t in range(16):
                logits, cache = s.step_fn(cache, prev, jnp.int32(t))
                prev = jnp.argmax(logits, -1).astype(jnp.int32)
                toks.append(np.asarray(prev))
            return np.stack(toks, 1)

        agreement = (gen(jnp.float32) == gen(jnp.int8)).mean()
        assert agreement >= 0.95, agreement


def test_rar_int8_weights_greedy_agreement():
    """Weight-only int8 (quantize_rar_params_int8): greedy decode agrees
    with float weights at tiny scale (opt-in serving lever)."""
    from wmar_tpu.models import RARConfig, RARSampler, init_rar_params
    from wmar_tpu.models.rar import quantize_rar_params_int8

    cfg = RARConfig(embed_dim=64, depth=2, num_heads=2, intermediate_size=128,
                    image_seq_len=16, codebook_size=64, num_classes=10)
    params = init_rar_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    cids = jnp.arange(2, dtype=jnp.int32)

    def gen(p):
        s = RARSampler(p, cfg, cids, guidance_scale=4.0, cache_dtype=jnp.float32)
        _, cache = s.prefill()
        prev = jnp.zeros((2,), jnp.int32)
        toks = []
        for t in range(16):
            logits, cache = s.step_fn(cache, prev, jnp.int32(t))
            prev = jnp.argmax(logits, -1).astype(jnp.int32)
            toks.append(np.asarray(prev))
        return np.stack(toks, 1)

    agreement = (gen(params) == gen(quantize_rar_params_int8(params))).mean()
    assert agreement >= 0.9, agreement


def test_gpt_int8_weights_greedy_agreement():
    """Weight-only int8 for taming minGPT: greedy decode agrees with float
    weights at tiny scale (same serving lever as RAR)."""
    from wmar_tpu.models import GPTConfig, init_gpt_params
    from wmar_tpu.models.taming_gpt import (
        make_step_fn,
        prefill,
        quantize_gpt_params_int8,
    )

    cfg = GPTConfig(vocab_size=64, block_size=64, n_layer=2, n_head=2, n_embd=32)
    params = init_gpt_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    cond = jnp.array([[3], [5]], dtype=jnp.int32)

    def gen(p):
        logits, cache = prefill(p, cfg, cond, max_len=32)
        step = make_step_fn(p, cfg, cond_len=1)
        prev = jnp.argmax(logits, -1).astype(jnp.int32)
        toks = [np.asarray(prev)]
        for t in range(1, 16):
            logits, cache = step(cache, prev, jnp.int32(t))
            prev = jnp.argmax(logits, -1).astype(jnp.int32)
            toks.append(np.asarray(prev))
        return np.stack(toks, 1)

    agreement = (gen(params) == gen(quantize_gpt_params_int8(params))).mean()
    assert agreement >= 0.9, agreement


def test_rar_int4_weights_greedy_agreement():
    """Grouped-int4 weights (bits=4): greedy decode still tracks the float
    model at tiny scale. int4 noise is larger than int8's, so the threshold
    is looser than the int8 weight one's."""
    from wmar_tpu.models import RARConfig, RARSampler, init_rar_params
    from wmar_tpu.models.rar import quantize_rar_params_int8

    cfg = RARConfig(embed_dim=64, depth=2, num_heads=2, intermediate_size=128,
                    image_seq_len=16, codebook_size=64, num_classes=10)
    params = init_rar_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    cids = jnp.arange(2, dtype=jnp.int32)

    def gen(p):
        s = RARSampler(p, cfg, cids, guidance_scale=4.0, cache_dtype=jnp.float32)
        _, cache = s.prefill()
        prev = jnp.zeros((2,), jnp.int32)
        toks = []
        for t in range(16):
            logits, cache = s.step_fn(cache, prev, jnp.int32(t))
            prev = jnp.argmax(logits, -1).astype(jnp.int32)
            toks.append(np.asarray(prev))
        return np.stack(toks, 1)

    q4 = quantize_rar_params_int8(params, bits=4)
    # the quantizer actually produced grouped-int4 leaves (not the int8
    # fallback) for the divisible matrices
    assert "w_q4" in q4["blocks"][0]["mlp"]["fc1"]
    agreement = (gen(params) == gen(q4)).mean()
    assert agreement >= 0.6, agreement


def test_gpt_int4_weights_greedy_agreement():
    """n_embd=128 (one full int4 group): at 32-wide the relative int4 noise
    is ~4x larger and greedy agreement on a random 2-layer model collapses —
    group-128 is the operating point the serving path actually uses."""
    from wmar_tpu.models import GPTConfig, init_gpt_params
    from wmar_tpu.models.taming_gpt import (
        make_step_fn,
        prefill,
        quantize_gpt_params_int8,
    )

    cfg = GPTConfig(vocab_size=64, block_size=64, n_layer=2, n_head=2, n_embd=128)
    params = init_gpt_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    cond = jnp.array([[3], [5]], dtype=jnp.int32)

    def gen(p):
        logits, cache = prefill(p, cfg, cond, max_len=32)
        step = make_step_fn(p, cfg, cond_len=1)
        prev = jnp.argmax(logits, -1).astype(jnp.int32)
        toks = [np.asarray(prev)]
        for t in range(1, 16):
            logits, cache = step(cache, prev, jnp.int32(t))
            prev = jnp.argmax(logits, -1).astype(jnp.int32)
            toks.append(np.asarray(prev))
        return np.stack(toks, 1)

    q4 = quantize_gpt_params_int8(params, bits=4)
    assert "q4" in q4["head"]
    # direct quant-noise measure: prefill logits track the float model
    ref_logits = np.asarray(prefill(params, cfg, cond, max_len=32)[0], np.float32)
    q4_logits = np.asarray(prefill(q4, cfg, cond, max_len=32)[0], np.float32)
    assert np.abs(q4_logits - ref_logits).max() <= 0.3 * np.abs(ref_logits).max()
    # sequence agreement compounds any single divergence (conditioning, not
    # per-step noise), so the bar is lower than the int8 one by design
    agreement = (gen(params) == gen(q4)).mean()
    assert agreement >= 0.5, agreement
