"""GPipe pipeline-parallel Llama prefill (parallel/pipeline.py).

Layers shard over a ``pp`` mesh axis; microbatches stream through the
stage ring via ppermute. Must match ``llama_forward`` exactly (same block
math via block_attn_inputs/block_finish) and hand a usable KV cache to the
decode step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.engine.kvcache import KVCache
from wmar_tpu.models.llama import (
    LlamaConfig,
    init_llama_params,
    llama_forward,
)
from wmar_tpu.parallel import llama_prefill_pp, make_mesh

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"

CFG = LlamaConfig(dim=32, n_layers=4, n_heads=4, vocab_size=64,
                  multiple_of=32, qk_normalization=True)


@pytest.fixture(scope="module")
def setup():
    params = init_llama_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    b, t, t_max = 4, 6, 10
    tokens = jnp.asarray(rng.integers(0, 64, (b, t)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    cache0 = KVCache.zeros(CFG.n_layers, b, CFG.n_heads, t_max, CFG.head_dim)
    return params, tokens, positions, cache0


def test_pp_prefill_matches_forward(setup):
    params, tokens, positions, cache0 = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh")
    ref_logits, ref_cache = llama_forward(params, CFG, tokens, cache0, 0,
                                          positions)
    mesh = make_mesh(dp=2, tp=1, pp=4)
    logits, cache = llama_prefill_pp(params, CFG, tokens, cache0, positions,
                                     mesh, microbatches=2)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(cache.k), np.asarray(ref_cache.k),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache.v), np.asarray(ref_cache.v),
                               atol=1e-5)


def test_pp_prefill_ragged_start_and_decode_handoff(setup):
    """Left-padded ragged prompts (per-row start) through the pipeline, then
    one decode step off the pp-built cache == the dense path."""
    params, tokens, positions, cache0 = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh")
    b, t = tokens.shape
    start = jnp.asarray([0, 2, 1, 0], jnp.int32)
    positions = jnp.maximum(jnp.arange(t)[None] - start[:, None], 0)

    ref_logits, ref_cache = llama_forward(params, CFG, tokens, cache0, 0,
                                          positions, start=start)
    mesh = make_mesh(dp=1, tp=2, pp=4)
    logits, cache = llama_prefill_pp(params, CFG, tokens, cache0, positions,
                                     mesh, microbatches=4, start=start)
    valid = np.arange(t)[None] >= np.asarray(start)[:, None]
    np.testing.assert_allclose(np.asarray(logits)[valid],
                               np.asarray(ref_logits)[valid],
                               atol=2e-4, rtol=2e-4)

    nxt = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    ref_nxt = jnp.argmax(ref_logits[:, -1:], -1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(nxt), np.asarray(ref_nxt))
    dec = lambda c, tok: llama_forward(  # noqa: E731
        params, CFG, tok, c, t, jnp.full((b, 1), t, jnp.int32) - start[:, None],
        start=start)[0]
    out = dec(cache, nxt)
    ref_out = dec(ref_cache, ref_nxt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-4, rtol=2e-4)


def test_pp_rejects_bad_geometry(setup):
    params, tokens, positions, cache0 = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh")
    mesh = make_mesh(dp=1, tp=1, pp=8)  # 4 layers % 8 stages != 0
    with pytest.raises(ValueError, match="not divisible by pp"):
        llama_prefill_pp(params, CFG, tokens, cache0, positions, mesh)


def test_pp_prefill_int8_weights(setup):
    """The pp stage body runs wquant int8 matmuls: stacked {"q","s"} quant
    dicts stream through the pipeline — the single-chip-7B serving config
    composed with pp. Parity vs the dense int8 path."""
    from wmar_tpu.models.llama import quantize_llama_params_int8

    params, tokens, positions, cache0 = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh")
    qparams = quantize_llama_params_int8(params)
    ref_logits, _ = llama_forward(qparams, CFG, tokens, cache0, 0, positions)
    mesh = make_mesh(dp=2, tp=1, pp=4)
    logits, _ = llama_prefill_pp(qparams, CFG, tokens, cache0, positions,
                                 mesh, microbatches=2)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-4, rtol=2e-4)
