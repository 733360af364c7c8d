"""Sampler primitives: warps, watermark bias, context keys, CFG."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.core import (
    HashGreenlist,
    WatermarkSpec,
    apply_watermark_bias,
    cfg_combine,
    context_keys_at_step,
    rar_cfg_scale,
    warp_and_sample,
)
from wmar_tpu.core.spec import SeedStrategy, SplitStrategy


def make_spec(**kw):
    base = dict(
        vocab_size=128,
        seed_strategy=SeedStrategy.LINEAR,
        split_strategy=SplitStrategy.RANDOM,
        context_size=2,
        delta=2.0,
        gamma=0.25,
    )
    base.update(kw)
    return WatermarkSpec(**base)


def test_topk_restricts_support(rng):
    logits = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
    topk_ids = np.asarray(jax.lax.top_k(logits, 5)[1])
    keys = jax.random.split(jax.random.PRNGKey(0), 50)
    for k in keys:
        toks = np.asarray(warp_and_sample(k, logits, top_k=5))
        for b in range(4):
            assert toks[b] in topk_ids[b]


def test_topp_keeps_crossing_token():
    # probs: 0.5, 0.3, 0.2 -> top_p=0.6 keeps tokens 0 and 1 (crossing token kept)
    logits = jnp.log(jnp.array([[0.5, 0.3, 0.2]], dtype=jnp.float32))
    seen = set()
    for s in range(200):
        t = int(warp_and_sample(jax.random.PRNGKey(s), logits, top_p=0.6)[0])
        seen.add(t)
    assert seen == {0, 1}


def test_greedy_matches_argmax(rng):
    logits = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
    toks = warp_and_sample(jax.random.PRNGKey(0), logits, top_k=50, top_p=0.9, greedy=True)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(jnp.argmax(logits, -1)))


def test_temperature_scaling_sharpens():
    logits = jnp.array([[1.0, 0.0]], dtype=jnp.float32)
    hot = sum(
        int(warp_and_sample(jax.random.PRNGKey(s), logits, temperature=0.05)[0] == 0)
        for s in range(100)
    )
    assert hot >= 99


def test_watermark_bias_shifts_green_logits():
    spec = make_spec()
    gl = HashGreenlist(spec)
    logits = jnp.zeros((3, 128), dtype=jnp.float32)
    keys = jnp.array([1, 2, 3], dtype=jnp.int32)
    out = apply_watermark_bias(spec, gl, logits, keys, jnp.bool_(True))
    mask = np.asarray(gl.green_mask(keys))
    np.testing.assert_allclose(np.asarray(out), mask * spec.delta, rtol=1e-6)
    # Invalid step -> no bias
    out0 = apply_watermark_bias(spec, gl, logits, keys, jnp.bool_(False))
    np.testing.assert_allclose(np.asarray(out0), 0.0)


def test_context_keys_linear():
    spec = make_spec(context_size=2)
    buf = jnp.array([[5, 7, 9, 0, 0]], dtype=jnp.int32)
    keys, valid = context_keys_at_step(spec, buf, jnp.int32(3), jnp.int32(3))
    assert bool(valid)
    assert int(keys[0]) == 7 + 9
    _, valid1 = context_keys_at_step(spec, buf, jnp.int32(1), jnp.int32(1))
    assert not bool(valid1)


def test_context_keys_spatial_h1():
    spec = make_spec(seed_strategy=SeedStrategy.SPATIAL, context_size=1, spatial_dim=4)
    # 4x4 grid; buffer holds 8 tokens (2 full rows), generating pos 8 (row 2 col 0)
    buf = jnp.arange(16, dtype=jnp.int32)[None, :] * 10
    keys, valid = context_keys_at_step(spec, buf, jnp.int32(8), jnp.int32(8))
    assert bool(valid)
    assert int(keys[0]) == 40  # token above = position 4 (value 40)
    # mid-row: left neighbor
    keys2, _ = context_keys_at_step(spec, buf, jnp.int32(6), jnp.int32(6))
    assert int(keys2[0]) == 50


def test_context_keys_spatial_h3():
    spec = make_spec(seed_strategy=SeedStrategy.SPATIAL, context_size=3, spatial_dim=4)
    buf = jnp.arange(16, dtype=jnp.int32)[None, :]
    # generating position 5 (row 1, col 1): context = pos 0 (ul), 1 (up), 4 (left)
    keys, valid = context_keys_at_step(spec, buf, jnp.int32(5), jnp.int32(5))
    assert bool(valid)
    assert int(keys[0]) == 0 + 1 + 4
    _, invalid = context_keys_at_step(spec, buf, jnp.int32(4), jnp.int32(4))
    assert not bool(invalid)


def test_rar_cfg_schedule_endpoints():
    s0 = rar_cfg_scale(jnp.int32(0), 256, guidance_scale=4.0, guidance_scale_pow=2.75)
    sT = rar_cfg_scale(jnp.int32(256), 256, guidance_scale=4.0, guidance_scale_pow=2.75)
    assert float(s0) == pytest.approx(1.0, abs=1e-5)
    assert float(sT) == pytest.approx(4.0, abs=1e-4)


def test_cfg_combine():
    c = jnp.array([2.0])
    u = jnp.array([1.0])
    assert float(cfg_combine(c, u, 3.0)[0]) == pytest.approx(4.0)
