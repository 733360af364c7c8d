"""Interleaved Chameleon decoding: text segments, modality switching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.models import ChameleonARMM, ChameleonVocab, GenParams, LlamaConfig, TamingVQGAN, VQGANConfig, init_llama_params
from wmar_tpu.models.chameleon_interleaved import (
    ChameleonTextSampler,
    TextGenOptions,
    repetition_penalty_mask,
    sample_interleaved,
    split_token_sequence,
)

VOCAB = ChameleonVocab.synthetic(n_codes=16, n_text=20)
LCFG = LlamaConfig(dim=32, n_layers=2, n_heads=4, vocab_size=VOCAB.vocab_size,
                   multiple_of=16, qk_normalization=True)
TINY_VQ = VQGANConfig(resolution=8, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(), z_channels=32, n_embed=16, embed_dim=8)


@pytest.fixture(scope="module")
def wrapper():
    params = init_llama_params(jax.random.PRNGKey(0), LCFG)
    vq = TamingVQGAN(TINY_VQ)
    vq_params = vq.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))
    return ChameleonARMM(
        params, LCFG, VOCAB, vq_params, TINY_VQ,
        tokenizer=lambda s: [6 + (ord(c) % 20) for c in s[:4]],
        image_seq_len=16, cache_dtype=jnp.float32,
    )


def test_split_token_sequence():
    boi, eoi = VOCAB.boi_id, VOCAB.eoi_id
    seq = np.asarray([[7, 8, boi, 50, 51, eoi, 9]])
    segs = split_token_sequence(seq, boi, eoi)
    kinds = [k for k, _ in segs]
    assert kinds == ["text_seg", "image_seg", "text_seg"]
    np.testing.assert_array_equal(segs[1][1][0], [50, 51])


def test_repetition_penalty():
    logits = jnp.asarray([[2.0, -2.0, 1.0]])
    counts = jnp.asarray([[1, 1, 0]])
    out = np.asarray(repetition_penalty_mask(logits, counts, 2.0))
    np.testing.assert_allclose(out[0], [1.0, -4.0, 1.0])


def test_text_sampler_emits_allowed_tokens(wrapper):
    opts = TextGenOptions(max_gen_len=12, temp=1.0, top_p=0.95)
    sampler = ChameleonTextSampler(wrapper.llama_params, LCFG, VOCAB, opts)
    prompts = jnp.asarray([[VOCAB.bos_id, 7, 8]], dtype=jnp.int32)
    toks, n_valid = sampler.generate(prompts, jnp.zeros((1,), jnp.int32), jax.random.PRNGKey(0))
    toks = np.asarray(toks)[0]
    allowed = set(VOCAB.text_tokens) | {VOCAB.eos_id, VOCAB.boi_id, VOCAB.pad_id}
    assert all(int(t) in allowed for t in toks)
    # after EOS/BOI everything is pad
    stops = [i for i, t in enumerate(toks) if t in (VOCAB.eos_id, VOCAB.boi_id)]
    if stops:
        assert (toks[stops[0] + 1:] == VOCAB.pad_id).all()


def test_text_sampler_boi_disallowed(wrapper):
    opts = TextGenOptions(max_gen_len=8, temp=1.0, top_p=1.0)
    sampler = ChameleonTextSampler(
        wrapper.llama_params, LCFG, VOCAB, opts, allow_image_start=False
    )
    prompts = jnp.asarray([[VOCAB.bos_id, 7]], dtype=jnp.int32)
    toks, _ = sampler.generate(prompts, jnp.zeros((1,), jnp.int32), jax.random.PRNGKey(3))
    assert VOCAB.boi_id not in np.asarray(toks)


def test_sample_interleaved_structure(wrapper):
    gen = GenParams(temperature=1.0, top_p=0.95)
    segs = sample_interleaved(
        wrapper, (0, "hi"), gen,
        text_opts=TextGenOptions(max_gen_len=6, temp=1.0, top_p=0.95),
        max_images=1, rng=jax.random.PRNGKey(0),
    )
    kinds = [k for k, _ in segs]
    assert all(k in ("text_seg", "image_seg") for k in kinds)
    for kind, toks in segs:
        if kind == "image_seg":
            # image segments are exactly 16 image BPE tokens
            assert toks.shape[1] == 16
            assert np.asarray(VOCAB.image_token_mask)[toks].all()


def test_text_watermark_hook(wrapper):
    from wmar_tpu.core import HashGreenlist, WatermarkSpec
    from wmar_tpu.core.spec import SeedStrategy, SplitStrategy
    from wmar_tpu.models.chameleon_interleaved import make_text_watermark

    spec = WatermarkSpec(
        vocab_size=VOCAB.vocab_size, seed_strategy=SeedStrategy.LINEAR,
        split_strategy=SplitStrategy.RANDOM, context_size=1, delta=20.0, gamma=0.5,
    )
    gl = HashGreenlist(spec)
    hook = make_text_watermark(spec, gl)
    opts = TextGenOptions(max_gen_len=16, temp=1.0, top_p=1.0)
    sampler = ChameleonTextSampler(
        wrapper.llama_params, LCFG, VOCAB, opts,
        allow_image_start=False, text_watermark=hook,
    )
    prompts = jnp.asarray([[VOCAB.bos_id, 7, 8]], dtype=jnp.int32)
    toks, _ = sampler.generate(prompts, jnp.zeros((1,), jnp.int32), jax.random.PRNGKey(0))
    toks_np = np.asarray(toks)[0]
    valid = [int(t) for t in toks_np if t not in (VOCAB.pad_id, VOCAB.eos_id)]
    if len(valid) > 4:
        # with delta=20 most consecutive pairs should be green
        import jax.numpy as jnp2

        keys = jnp2.asarray(valid[:-1], jnp2.int32)
        greens = np.asarray(gl.green_lookup(keys, jnp2.asarray(valid[1:], jnp2.int32)))
        assert greens.mean() > 0.7, greens
