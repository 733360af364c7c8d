"""Pallas flash-decode kernel + upfirdn/fused ops vs XLA references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.engine.attention import decode_attention
from wmar_tpu.ops import flash_decode_attention, fused_bias_act, upfirdn2d


@pytest.mark.parametrize("start", [None, "ragged"])
def test_flash_decode_matches_xla(rng, start):
    b, h, t, d = 3, 2, 32, 128
    q = jnp.asarray(rng.normal(size=(b, h, 1, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    valid_len = jnp.int32(20)
    starts = jnp.array([0, 3, 7], jnp.int32) if start else None
    ref = decode_attention(q, k, v, valid_len, start=starts)
    # interpret=True: run the Pallas kernel on CPU in interpreter mode
    out = flash_decode_attention(q, k, v, valid_len, start=starts, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_upfirdn2d_identity():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 2)).astype(np.float32))
    k = jnp.asarray([[1.0]])
    out = upfirdn2d(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_upfirdn2d_upsample_box():
    x = jnp.ones((1, 4, 4, 1), jnp.float32)
    k = jnp.ones((2, 2), jnp.float32)
    out = upfirdn2d(x, k, up=2, pad=(1, 0))
    assert out.shape == (1, 8, 8, 1)
    # interior: each output pixel covered by exactly one input (zero-stuffed
    # grid convolved with a 2x2 box of ones) -> 1.0
    np.testing.assert_allclose(np.asarray(out)[0, 1:-1, 1:-1, 0], 1.0, atol=1e-6)


def test_upfirdn2d_downsample():
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    k = jnp.asarray([[1.0]])
    out = upfirdn2d(x, k, down=2)
    assert out.shape == (1, 2, 2, 1)
    np.testing.assert_allclose(np.asarray(out)[0, :, :, 0], [[0, 2], [8, 10]])


def test_fused_bias_act():
    x = jnp.asarray([-1.0, 2.0])
    out = fused_bias_act(x, bias=jnp.asarray([0.5, 0.5]), act="lrelu", alpha=0.2, gain=1.0)
    np.testing.assert_allclose(np.asarray(out), [-0.1, 2.5], atol=1e-6)


@pytest.mark.parametrize("start", [None, "ragged"])
def test_flash_decode_q8_matches_xla(rng, start):
    """int8-cache kernel (VMEM dequant) vs the XLA path over the dequantized
    QuantKVCache — identical inputs, quantization included in both."""
    from wmar_tpu.engine.kvcache import KVCache
    from wmar_tpu.ops.flash_decode import flash_decode_attention_q8

    b, h, t, d = 3, 2, 32, 128
    cq = KVCache.zeros(1, b, h, t, d, dtype=jnp.int8)
    for i in range(20):
        cq = cq.write(0, i,
                      jnp.asarray(rng.normal(size=(b, h, 1, d)).astype(np.float32)),
                      jnp.asarray(rng.normal(size=(b, h, 1, d)).astype(np.float32)))
    q = jnp.asarray(rng.normal(size=(b, h, 1, d)).astype(np.float32))
    valid_len = jnp.int32(20)
    starts = jnp.array([0, 3, 7], jnp.int32) if start else None
    ref = decode_attention(q, *cq.layer(0), valid_len, start=starts)
    out = flash_decode_attention_q8(
        q, cq.k[0], cq.v[0], cq.k_scale[0], cq.v_scale[0], valid_len,
        start=starts, interpret=True,
    )
    # bf16 dequant in the reference path dominates the tolerance
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)


def test_flash_decode_key_mask(rng):
    """Per-row key masks (the fused interleaved CFG rows) agree with the XLA
    path in both kernels."""
    from wmar_tpu.engine.kvcache import KVCache
    from wmar_tpu.ops.flash_decode import flash_decode_attention_q8

    b, h, t, d = 3, 2, 32, 128
    q = jnp.asarray(rng.normal(size=(b, h, 1, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    valid_len = jnp.int32(24)
    key_mask = jnp.asarray(rng.random((b, t)) > 0.4)
    key_mask = key_mask.at[:, 0].set(True)  # keep every row non-empty
    ref = decode_attention(q, k, v, valid_len, key_mask=key_mask)
    out = flash_decode_attention(q, k, v, valid_len, key_mask=key_mask,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    cq = KVCache.zeros(1, b, h, t, d, dtype=jnp.int8)
    cq = cq.write(0, 0, k, v)
    ref_q = decode_attention(q, *cq.layer(0), valid_len, key_mask=key_mask)
    out_q = flash_decode_attention_q8(
        q, cq.k[0], cq.v[0], cq.k_scale[0], cq.v_scale[0], valid_len,
        key_mask=key_mask, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out_q, np.float32),
                               np.asarray(ref_q, np.float32), atol=2e-2)
