"""Audio: watermark samplers/detectors, Mimi codec, Moshi generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.audio import (
    Mimi,
    MimiConfig,
    MoshiConfig,
    MoshiGen,
    WMConfig,
    gumbel_sample,
    gumbel_score,
    init_moshi_params,
    maryland_green,
    maryland_sample,
    pvalue_gumbel,
    pvalue_maryland,
    score_stream_maryland,
    window_hash,
)

TINY_MIMI = MimiConfig(
    dimension=64, n_filters=8, ratios=(4, 2), n_residual_layers=1,
    n_q=4, n_q_semantic=1, cardinality=32, codebook_dim=16,
    transformer_layers=1, transformer_heads=2, downsample=2,
)
TINY_MOSHI = MoshiConfig(
    n_audio_streams=4, audio_vocab=32, text_vocab=50,
    dim=32, n_layers=2, n_heads=2, dep_dim=32, dep_layers=1, dep_heads=2,
    delays=(0, 1, 1, 1),
)


def test_window_hash_basics():
    ng = jnp.array([[1, 2], [1, 2], [3, 4]], dtype=jnp.int32)
    h = np.asarray(window_hash(ng, seed=7))
    assert h[0] == h[1] and h[0] != h[2]
    # n = 0 -> seed
    h0 = np.asarray(window_hash(jnp.zeros((2, 0), jnp.int32), seed=7))
    assert (h0 == 7).all()


def test_gumbel_sample_deterministic_and_distortion():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 64)).astype(np.float32))
    h = jnp.array([1, 2, 3, 4], dtype=jnp.int32)
    t1 = np.asarray(gumbel_sample(logits, h, temp=1.0, top_p=0.9))
    t2 = np.asarray(gumbel_sample(logits, h, temp=1.0, top_p=0.9))
    np.testing.assert_array_equal(t1, t2)  # deterministic given hash
    t3 = np.asarray(gumbel_sample(logits, h + 10, temp=1.0, top_p=0.9))
    assert (t1 != t3).any()
    # greedy mode
    tg = np.asarray(gumbel_sample(logits, h, use_sampling=False))
    np.testing.assert_array_equal(tg, np.asarray(jnp.argmax(logits, -1)))


def test_gumbel_scores_higher_for_sampled_tokens(rng):
    """Tokens produced by gumbel sampling score above random tokens."""
    n = 200
    hashes = jnp.asarray(rng.integers(0, 2**31, size=(n,)).astype(np.int32))
    logits = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))
    toks = gumbel_sample(logits, hashes, temp=1.0)
    s_wm = float(gumbel_score(toks, hashes).sum())
    rand_toks = jnp.asarray(rng.integers(0, 64, size=(n,)))
    s_rand = float(gumbel_score(rand_toks, hashes).sum())
    assert s_wm > s_rand
    p_wm = float(pvalue_gumbel(jnp.float32(s_wm), jnp.int32(n)))
    p_rand = float(pvalue_gumbel(jnp.float32(s_rand), jnp.int32(n)))
    assert p_wm < 1e-6 and p_rand > 1e-4


def test_maryland_sample_and_score(rng):
    n = 300
    hashes = jnp.asarray(rng.integers(0, 2**31, size=(n,)).astype(np.int32))
    logits = jnp.zeros((n, 64), jnp.float32)
    toks = maryland_sample(
        logits, hashes, rng=jax.random.PRNGKey(0), temp=1.0, gamma=0.25, delta=6.0
    )
    green = np.asarray(maryland_green(hashes, toks, 0.25))
    assert green.mean() > 0.8  # strong bias -> mostly green
    n_green, n_scored = score_stream_maryland(toks, hashes, gamma=0.25)
    p = float(pvalue_maryland(n_green, n_scored, 0.25))
    assert p < 1e-6
    # unwatermarked tokens -> high p
    rand_toks = jnp.asarray(rng.integers(0, 64, size=(n,)))
    ng, ns = score_stream_maryland(rand_toks, hashes, gamma=0.25)
    assert float(pvalue_maryland(ng, ns, 0.25)) > 1e-4


def test_score_stream_dedup():
    toks = jnp.array([5, 5, 7], dtype=jnp.int32)
    hashes = jnp.array([1, 1, 1], dtype=jnp.int32)
    _, n_scored = score_stream_maryland(toks, hashes, gamma=0.5)
    assert int(n_scored) == 2  # (5,1) counted once


@pytest.fixture(scope="module")
def mimi():
    model = Mimi(TINY_MIMI)
    audio = jnp.zeros((1, TINY_MIMI.hop_length * 4, 1))
    params = model.init(jax.random.PRNGKey(0), audio)
    return model, params


def test_mimi_encode_decode_shapes(mimi, rng):
    model, params = mimi
    t = TINY_MIMI.hop_length * 4  # 4 frames
    audio = jnp.asarray(rng.uniform(-1, 1, size=(2, t, 1)).astype(np.float32))
    codes = model.apply(params, audio, method=Mimi.encode)
    assert codes.shape == (2, TINY_MIMI.n_q, 4)
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 32).all()
    rec = model.apply(params, codes, method=Mimi.decode)
    assert rec.shape == (2, t, 1)


def test_mimi_rvq_residual_structure(mimi, rng):
    """Each RVQ level strictly reduces the residual in codebook space."""
    model, params = mimi
    t = TINY_MIMI.hop_length * 4
    audio = jnp.asarray(rng.uniform(-1, 1, size=(1, t, 1)).astype(np.float32))

    def residual_norms(m, a):
        z = m._to_latent(a)
        rvq = m.rvq_rest  # 3 levels in the tiny config
        y = rvq.input_proj(z)
        residual = y
        norms = []
        for q in range(rvq.n_q):
            emb = rvq.codebooks[q]
            d = (emb**2).sum(-1) - 2.0 * residual @ emb.T
            idx = jnp.argmin(d, axis=-1)
            residual = residual - emb[idx]
            norms.append((residual**2).mean())
        return jnp.stack(norms)

    norms = np.asarray(model.apply(params, audio, method=residual_norms))
    assert (np.diff(norms) < 0).all(), norms  # strictly decreasing


def test_mimi_decode_of_encode_matches_quantized(mimi, rng):
    """decode path consumes exactly the codes encode produced (same space)."""
    model, params = mimi
    t = TINY_MIMI.hop_length * 2
    audio = jnp.asarray(rng.uniform(-1, 1, size=(1, t, 1)).astype(np.float32))
    codes = model.apply(params, audio, method=Mimi.encode)
    rec1 = model.apply(params, codes, method=Mimi.decode)
    rec2 = model.apply(params, codes, method=Mimi.decode)
    np.testing.assert_array_equal(np.asarray(rec1), np.asarray(rec2))


def test_moshi_generation_watermarked_detects():
    params = init_moshi_params(jax.random.PRNGKey(0), TINY_MOSHI)
    wm = WMConfig(method="maryland", streams=tuple(range(5)), ngram=0,
                  delta=8.0, gamma=0.25, temp=1.0, top_k=0)
    gen = MoshiGen(params, TINY_MOSHI, wm)
    text, audio = jax.jit(lambda r: gen.generate(48, r, batch=2))(jax.random.PRNGKey(1))
    assert text.shape == (2, 48)
    assert audio.shape == (2, 4, 48)
    assert (np.asarray(audio) < TINY_MOSHI.audio_vocab).all()

    # score stream 1 (first audio codebook) with the fixed hash
    hashes = window_hash(jnp.zeros((48, 0), jnp.int32), wm.seed)
    n_green, n_scored = score_stream_maryland(audio[0, 0], hashes, gamma=0.25)
    p = float(pvalue_maryland(n_green, n_scored, 0.25))
    assert p < 1e-3, (p, int(n_green), int(n_scored))

    # unwatermarked generation should not detect
    gen0 = MoshiGen(params, TINY_MOSHI, None)
    _, audio0 = gen0.generate(48, jax.random.PRNGKey(2), batch=1)
    ng0, ns0 = score_stream_maryland(audio0[0, 0], hashes, gamma=0.25)
    assert float(pvalue_maryland(ng0, ns0, 0.25)) > 1e-3


def test_moshi_int8_weights_generation_agreement():
    """Weight-only int8 on the temporal backbone + text head: same-rng
    generation stays in close agreement with the float model."""
    from wmar_tpu.audio.lm import quantize_moshi_params_int8

    params = init_moshi_params(jax.random.PRNGKey(0), TINY_MOSHI)
    qparams = quantize_moshi_params_int8(params)

    def run(p):
        gen = MoshiGen(p, TINY_MOSHI, None)
        text, audio = gen.generate(24, jax.random.PRNGKey(3), batch=2)
        return np.asarray(text), np.asarray(audio)

    t_ref, a_ref = run(params)
    t_q, a_q = run(qparams)
    assert (t_q == t_ref).mean() >= 0.7, (t_q == t_ref).mean()
    assert (a_q == a_ref).mean() >= 0.7, (a_q == a_ref).mean()


def test_moshi_prompt_teacher_forcing():
    """prompt_codes force the *generated* frames; the emitted stream is
    delay-aligned (LMGen's output gather), so stream k shows prompt frames
    shifted by its delay."""
    params = init_moshi_params(jax.random.PRNGKey(0), TINY_MOSHI)
    gen = MoshiGen(params, TINY_MOSHI, None)
    prompt = jnp.asarray(np.random.default_rng(0).integers(0, 32, size=(1, 4, 5)))
    _, audio = gen.generate(12, jax.random.PRNGKey(0), batch=1, prompt_codes=prompt)
    for k, delay in enumerate(TINY_MOSHI.delays):
        tp = prompt.shape[-1]
        np.testing.assert_array_equal(
            np.asarray(audio[:, k, : tp - delay]), np.asarray(prompt[:, k, delay:])
        )


def test_moshi_text_prompt_teacher_forcing():
    params = init_moshi_params(jax.random.PRNGKey(0), TINY_MOSHI)
    gen = MoshiGen(params, TINY_MOSHI, None)
    text_prompt = jnp.asarray(np.random.default_rng(1).integers(0, 50, size=(1, 6)))
    text, _ = gen.generate(12, jax.random.PRNGKey(0), batch=1, text_prompt=text_prompt)
    np.testing.assert_array_equal(np.asarray(text[:, :6]), np.asarray(text_prompt))
