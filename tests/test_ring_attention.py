"""Ring-attention sequence-parallel prefill (parallel/ring.py).

The reference prefills replicated on every worker
(deps/chameleon/inference/generation.py); here the sequence axis shards
over an ``sp`` mesh axis and KV blocks rotate via ppermute. These tests
pin the ring kernel to the dense masked attention it replaces, and the
full ``llama_prefill_sp`` to ``llama_forward`` on the virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from wmar_tpu.models.llama import (
    LlamaConfig,
    init_llama_params,
    llama_forward,
    llama_prefill_sp,
)
from wmar_tpu.engine.kvcache import KVCache
from wmar_tpu.parallel import make_mesh, ring_prefill_attention
import pytest

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"


def dense_masked_attention(q, k, v, start=None, key_mask=None):
    """Reference: causal attention with per-row start + key validity."""
    b, h, t, d = q.shape
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (d**-0.5)
    qi = jnp.arange(t)
    ok = (qi[None, :, None] >= qi[None, None, :])  # causal [1, Tq, Tk]
    if start is not None:
        ok = ok & (qi[None, None, :] >= start[:, None, None])
    else:
        ok = jnp.broadcast_to(ok, (b, t, t))
    if key_mask is not None:
        ok = ok & key_mask[:, None, :]
    s = jnp.where(ok[:, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1) * ok[:, None]
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def test_ring_matches_dense_sp8():
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((2, 3, 16, 8)), jnp.float32)
               for _ in range(3))
    start = jnp.asarray([0, 5], jnp.int32)
    key_mask = jnp.asarray(rng.random((2, 16)) > 0.2)
    # row pads must stay valid keys for themselves: ensure diagonal reachable
    key_mask = key_mask.at[:, 0].set(True)

    ref = dense_masked_attention(q, k, v, start, key_mask)
    mesh = make_mesh(dp=1, tp=1, sp=8)
    out = ring_prefill_attention(q, k, v, mesh, tp_axis="tp", dp_axis="dp",
                                 start=start, key_mask=key_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ring_matches_dense_dp_tp_sp():
    """Composes with dp×tp: heads on tp, rows on dp, sequence on sp."""
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.standard_normal((4, 4, 8, 8)), jnp.float32)
               for _ in range(3))
    ref = dense_masked_attention(q, k, v)
    mesh = make_mesh(dp=2, tp=2, sp=2)
    out = ring_prefill_attention(q, k, v, mesh, tp_axis="tp", dp_axis="dp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_llama_prefill_sp_matches_forward():
    """Full llama prefill: ring path == dense path (logits and KV cache)."""
    cfg = LlamaConfig(dim=32, n_layers=2, n_heads=4, vocab_size=64,
                      multiple_of=32, qk_normalization=True)
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    b, t, t_max = 2, 16, 24
    tokens = jnp.asarray(rng.integers(0, 64, (b, t)), jnp.int32)
    start = jnp.asarray([0, 4], jnp.int32)
    # right-aligned ragged prompts: positions are prompt-relative
    positions = jnp.maximum(jnp.arange(t)[None] - start[:, None], 0)

    cache0 = KVCache.zeros(cfg.n_layers, b, cfg.n_heads, t_max, cfg.head_dim)
    ref_logits, ref_cache = llama_forward(params, cfg, tokens, cache0, 0,
                                          positions, start=start)

    mesh = make_mesh(dp=2, tp=1, sp=4)
    logits, cache = llama_prefill_sp(params, cfg, tokens, cache0, positions,
                                     mesh, tp_axis="tp", dp_axis="dp",
                                     start=start)
    # pad queries (qi < start) attend nothing: the dense softmax leaves
    # uniform garbage there, the ring path zeros — both meaningless by the
    # right-aligned-prompt contract, so compare valid positions only
    valid = np.arange(t)[None] >= np.asarray(start)[:, None]
    np.testing.assert_allclose(np.asarray(logits)[valid],
                               np.asarray(ref_logits)[valid],
                               atol=2e-4, rtol=2e-4)
    # same pad-position caveat for layer≥2 K/V (their inputs pass through
    # layer-1 attention); valid cache slots must agree exactly
    cvalid = np.arange(t_max)[None] >= np.asarray(start)[:, None]  # [B, T_max]
    cm = np.broadcast_to(cvalid[None, :, None, :, None],
                         np.asarray(cache.k).shape)
    np.testing.assert_allclose(np.asarray(cache.k)[cm],
                               np.asarray(ref_cache.k)[cm], atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache.v)[cm],
                               np.asarray(ref_cache.v)[cm], atol=1e-5)


def test_llama_prefill_sp_int8_weights():
    """Ring prefill with weight-only int8 params (the single-chip-7B serving
    config composed with sp) matches the dense int8 path."""
    from wmar_tpu.models.llama import quantize_llama_params_int8

    cfg = LlamaConfig(dim=32, n_layers=2, n_heads=4, vocab_size=64,
                      multiple_of=32, qk_normalization=True)
    params = quantize_llama_params_int8(
        init_llama_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(3)
    b, t = 2, 16
    tokens = jnp.asarray(rng.integers(0, 64, (b, t)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    cache0 = KVCache.zeros(cfg.n_layers, b, cfg.n_heads, t + 4, cfg.head_dim)
    ref, _ = llama_forward(params, cfg, tokens, cache0, 0, positions)
    mesh = make_mesh(dp=2, tp=1, sp=4)
    out, _ = llama_prefill_sp(params, cfg, tokens, cache0, positions, mesh,
                              tp_axis="tp", dp_axis="dp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
