"""Model frontends at tiny configs: shapes, cache equivalence, E2E wrappers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.core import HashGreenlist, WatermarkSpec, detect
from wmar_tpu.core.spec import SeedStrategy, SplitStrategy
from wmar_tpu.engine import KVCache
from wmar_tpu.models import (
    GenParams,
    GPTConfig,
    MaskGitVQConfig,
    MaskGitVQGAN,
    RARConfig,
    RARSampler,
    RarARMM,
    TamingARMM,
    TamingVQGAN,
    VQGANConfig,
    init_gpt_params,
    init_rar_params,
)
from wmar_tpu.models.rar import rar_forward_cached, _embed_inputs

TINY_VQ = VQGANConfig(
    resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,),
    z_channels=32, n_embed=64, embed_dim=16,
)
TINY_MGVQ = MaskGitVQConfig(
    resolution=8, hidden_channels=32, channel_mult=(1, 2), num_res_blocks=1,
    z_channels=16, n_embed=64, embed_dim=16,
)
TINY_RAR = RARConfig(
    embed_dim=32, depth=2, num_heads=2, intermediate_size=64,
    image_seq_len=16, codebook_size=64, num_classes=10,
)
TINY_GPT = GPTConfig(vocab_size=64, block_size=300, n_layer=2, n_head=2, n_embd=32)


@pytest.fixture(scope="module")
def taming_vq():
    model = TamingVQGAN(TINY_VQ)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    return model, params


@pytest.fixture(scope="module")
def mg_vq():
    model = MaskGitVQGAN(TINY_MGVQ)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, TINY_MGVQ.resolution, TINY_MGVQ.resolution, 3)))
    return model, params


def test_taming_vqgan_roundtrip_shapes(taming_vq, rng):
    model, params = taming_vq
    imgs = jnp.asarray(rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32))
    codes = model.apply(params, imgs, method=TamingVQGAN.encode_codes)
    assert codes.shape == (2, TINY_VQ.codes_per_side**2)
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 64).all()
    rec = model.apply(params, codes, method=TamingVQGAN.decode_codes)
    assert rec.shape == (2, 32, 32, 3)
    # decode(encode(decode(codes))) is stable given the same codes
    codes2 = model.apply(params, rec, method=TamingVQGAN.encode_codes)
    assert codes2.shape == codes.shape


def test_taming_vqgan_code_identity(taming_vq):
    """Decoding codes then re-looking-up embeddings is deterministic."""
    model, params = taming_vq
    codes = jnp.arange(2 * 256, dtype=jnp.int32).reshape(2, 256) % 64
    rec1 = model.apply(params, codes, method=TamingVQGAN.decode_codes)
    rec2 = model.apply(params, codes, method=TamingVQGAN.decode_codes)
    np.testing.assert_array_equal(np.asarray(rec1), np.asarray(rec2))


def test_maskgit_vqgan_roundtrip_shapes(mg_vq, rng):
    model, params = mg_vq
    r = TINY_MGVQ.resolution
    imgs = jnp.asarray(rng.uniform(-1, 1, size=(2, r, r, 3)).astype(np.float32))
    codes = model.apply(params, imgs, method=MaskGitVQGAN.encode_codes)
    assert codes.shape == (2, TINY_MGVQ.codes_per_side**2)
    rec = model.apply(params, codes, method=MaskGitVQGAN.decode_codes)
    assert rec.shape == (2, r, r, 3)
    assert np.asarray(rec).min() >= -1.0 and np.asarray(rec).max() <= 1.0


@pytest.fixture(scope="module")
def rar_params():
    return init_rar_params(jax.random.PRNGKey(1), TINY_RAR)


def test_rar_cached_matches_burst(rar_params):
    """prefill + 1-token steps == one multi-token burst through the cache."""
    params = rar_params
    cfg = TINY_RAR
    class_ids = jnp.array([3, 7], dtype=jnp.int32)
    sampler = RARSampler(params, cfg, class_ids, guidance_scale=0.0)

    # Path A: prefill (2 tokens) then feed tok0, tok1 one at a time.
    logits0, cache = sampler.prefill()
    tok0 = jnp.array([5, 9], dtype=jnp.int32)
    logits1, cache = sampler.step_fn(cache, tok0, jnp.int32(1))
    tok1 = jnp.array([11, 2], dtype=jnp.int32)
    logits2, _ = sampler.step_fn(cache, tok1, jnp.int32(2))

    # Path B: one burst [cls, cond, tok0, tok1] through a fresh cache.
    cond = class_ids + cfg.codebook_size + 1
    x_cond = _embed_inputs(params, cfg, cond[:, None], jnp.ones((1, 1), jnp.int32))
    x_toks = _embed_inputs(
        params, cfg, jnp.stack([tok0, tok1], axis=1), jnp.array([[2, 3]], jnp.int32)
    )
    cls = jnp.broadcast_to(params["cls_token"] + params["pos_embed"][0], (2, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x_cond, x_toks], axis=1)
    cond_emb = params["embeddings"][cond]
    c = cond_emb[:, None, :] + params["timesteps_embeddings"][jnp.arange(4)][None]
    cache_b = KVCache.zeros(cfg.depth, 2, cfg.num_heads, cfg.max_positions, cfg.head_dim)
    logits_burst, _ = rar_forward_cached(params, cfg, x, c, cache_b, 0)

    np.testing.assert_allclose(np.asarray(logits2), np.asarray(logits_burst), rtol=2e-4, atol=2e-4)


def test_rar_armm_sample_detect(rar_params, mg_vq):
    """Full RAR pipeline: watermarked sample -> decode -> encode -> detect."""
    _, vq_params = mg_vq
    wrapper = RarARMM(rar_params, TINY_RAR, vq_params, TINY_MGVQ, cache_dtype=jnp.float32)
    spec = WatermarkSpec(
        vocab_size=64,
        seed_strategy=SeedStrategy.LINEAR,
        split_strategy=SplitStrategy.RANDOM,
        context_size=1,
        delta=10.0,
        gamma=0.25,
    )
    wrapper.set_watermarker(spec)
    gen = GenParams(temperature=1.0, top_k=32, guidance_scale=4.0)
    codes = wrapper.sample([1, 2], gen, apply_watermark=True, rng=jax.random.PRNGKey(0))
    assert wrapper.is_codes_shaped(codes)
    pv = np.asarray(detect(spec, wrapper.greenlist, codes))
    assert (pv < 1e-2).all(), pv

    imgs = wrapper.codes_to_images(codes)
    assert wrapper.is_images_shaped(imgs)
    codes2 = wrapper.images_to_codes(imgs)
    assert codes2.shape == codes.shape


def test_rar_cfg_doubles_cache_only(rar_params):
    sampler = RARSampler(rar_params, TINY_RAR, jnp.array([0], jnp.int32), guidance_scale=2.0)
    logits, cache = sampler.prefill()
    assert logits.shape == (1, 64)  # combined back to B
    assert cache.k.shape[1] == 2  # 2B rows in cache


def test_taming_armm_sample_detect(taming_vq):
    model, vq_params = taming_vq
    gpt_params = init_gpt_params(jax.random.PRNGKey(2), TINY_GPT)
    wrapper = TamingARMM(gpt_params, TINY_GPT, vq_params, TINY_VQ)
    spec = WatermarkSpec(
        vocab_size=64,
        seed_strategy=SeedStrategy.LINEAR,
        split_strategy=SplitStrategy.RANDOM,
        context_size=1,
        delta=10.0,
        gamma=0.25,
    )
    wrapper.set_watermarker(spec)
    gen = GenParams(temperature=1.0, top_k=40, top_p=0.95)
    codes = wrapper.sample([3, 5], gen, apply_watermark=True, rng=jax.random.PRNGKey(1))
    assert wrapper.is_codes_shaped(codes)
    pv = np.asarray(detect(spec, wrapper.greenlist, codes))
    assert (pv < 1e-2).all(), pv
    imgs = wrapper.codes_to_images(codes)
    assert wrapper.is_images_shaped(imgs)
    codes_rt = wrapper.images_to_codes(imgs)
    assert codes_rt.shape == codes.shape


def test_rar_spatial_watermark_e2e(rar_params, mg_vq):
    """Spatial seeding: generation contexts line up with spatial-ngram
    detection (grid neighbors), end to end."""
    _, vq_params = mg_vq
    wrapper = RarARMM(rar_params, TINY_RAR, vq_params, TINY_MGVQ, cache_dtype=jnp.float32)
    spec = WatermarkSpec(
        vocab_size=64, seed_strategy=SeedStrategy.SPATIAL,
        split_strategy=SplitStrategy.RANDOM, context_size=1, delta=10.0,
        gamma=0.25, spatial_dim=4,
    )
    wrapper.set_watermarker(spec)
    gen = GenParams(temperature=1.0, guidance_scale=0.0)
    codes = wrapper.sample([1, 2, 3, 4], gen, apply_watermark=True, rng=jax.random.PRNGKey(0))
    pv = np.asarray(detect(spec, wrapper.greenlist, codes))
    assert (pv < 0.05).all(), pv


def test_flash_decode_auto_threshold(monkeypatch):
    """Default flash mode is AUTO: kernel only at >= 2048-slot caches
    (end-to-end evidence in PERFORMANCE.md), forced by WMAR_FLASH_DECODE."""
    import wmar_tpu.models.llama as L

    monkeypatch.setattr(L, "USE_FLASH_DECODE", None)
    single = jax.device_count() == 1
    assert not L._flash_enabled(258)
    assert not L._flash_enabled(1024)
    # auto also requires a single device: a bare pallas_call would force a
    # sharded cache to be replicated (this test env forces 8 CPU devices)
    assert L._flash_enabled(2048) == single
    assert L._flash_enabled(4096) == single
    monkeypatch.setattr(L, "USE_FLASH_DECODE", True)
    assert L._flash_enabled(258)
    monkeypatch.setattr(L, "USE_FLASH_DECODE", False)
    assert not L._flash_enabled(4096)
