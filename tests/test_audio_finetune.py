"""Mimi RCC finetune + audio augmentations."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from wmar_tpu.audio import Mimi, MimiConfig
from wmar_tpu.audio import augmentations as A
from wmar_tpu.audio.finetune import (
    MimiFTConfig,
    MimiFTWrapper,
    init_state,
    make_train_step,
    multi_res_stft_loss,
    validation_token_match,
)

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"

TINY = MimiConfig(
    dimension=32, n_filters=8, ratios=(4, 2), n_residual_layers=1,
    n_q=2, n_q_semantic=1, cardinality=16, codebook_dim=8,
    transformer_layers=1, transformer_heads=2, downsample=1,
)


@pytest.fixture(scope="module")
def wrapper():
    model = Mimi(TINY)
    audio = jnp.zeros((1, TINY.hop_length * 8, 1))
    variables = model.init(jax.random.PRNGKey(0), audio)
    return MimiFTWrapper(model, variables)


def test_audio_augs_shapes(rng):
    audio = jnp.asarray(rng.uniform(-1, 1, size=(2, 256, 1)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    for name, fn, params in A.get_validation_augs():
        out = fn(audio, params[0], key)
        assert out.shape == audio.shape, name
        assert np.isfinite(np.asarray(out)).all(), name


def test_speed_changes_content(rng):
    audio = jnp.asarray(np.sin(np.linspace(0, 60, 256)).astype(np.float32))[None, :, None]
    fast = A.speed(audio, 1.25)
    assert fast.shape == audio.shape
    assert not np.allclose(np.asarray(fast), np.asarray(audio))


def test_lowpass_removes_high_freq():
    t = np.arange(512) / 512
    lo = np.sin(2 * np.pi * 4 * t)
    hi = np.sin(2 * np.pi * 200 * t)
    x = jnp.asarray((lo + hi).astype(np.float32))[None, :, None]
    y = np.asarray(A.lowpass(x, 0.1))[0, :, 0]
    # high component mostly gone, low kept
    corr_lo = np.corrcoef(y[64:-64], lo[64:-64])[0, 1]
    assert corr_lo > 0.9
    assert np.abs(y).max() < 1.3


def test_mrstft_zero_for_identical(rng):
    a = jnp.asarray(rng.uniform(-1, 1, size=(1, 512, 1)).astype(np.float32))
    assert float(multi_res_stft_loss(a, a)) < 1e-6
    b = jnp.asarray(rng.uniform(-1, 1, size=(1, 512, 1)).astype(np.float32))
    assert float(multi_res_stft_loss(a, b)) > 0.1


def test_mimi_finetune_step_improves_idem(wrapper):
    cfg = MimiFTConfig(lr=3e-4, aug_prob=0.0)
    opt = optax.adam(cfg.lr)
    step = jax.jit(make_train_step(wrapper, cfg, opt))
    state = init_state(wrapper, opt)
    codes = jnp.asarray(np.random.default_rng(0).integers(0, 16, size=(2, 2, 8)))
    first = None
    for i in range(6):
        state, metrics = step(state, codes, jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics["idem"])
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["idem"]) < first


def test_validation_token_match(wrapper):
    trainable = wrapper.init_trainable()
    codes = jnp.asarray(np.random.default_rng(1).integers(0, 16, size=(1, 2, 8)))
    tm = np.asarray(validation_token_match(wrapper, trainable, codes))
    assert tm.shape == (1, 2)
    assert ((tm >= 0) & (tm <= 1)).all()


def test_sisnr_metric():
    from wmar_tpu.utils.metrics import sisnr

    x = np.sin(np.linspace(0, 50, 1000))
    assert sisnr(x, x) > 80  # identical -> huge SNR
    assert sisnr(2 * x, x) > 80  # scale-invariant
    assert sisnr(np.random.default_rng(0).normal(size=1000), x) < 5


def test_stoi_metric():
    from wmar_tpu.utils.metrics import stoi

    rng_np = np.random.default_rng(0)
    t = np.arange(24000 * 2) / 24000
    # speech-band modulated tone (STOI needs non-silent, structured signal)
    x = (np.sin(2 * np.pi * 400 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * t))).astype(np.float32)
    assert stoi(x, x, fs=24000) > 0.99  # identical -> ~1
    noisy = x + 0.8 * rng_np.normal(size=x.shape).astype(np.float32)
    mid = stoi(noisy, x, fs=24000)
    assert 0.0 < mid < 0.95
    garbage = rng_np.normal(size=x.shape).astype(np.float32)
    assert stoi(garbage, x, fs=24000) < mid


def test_new_aug_families(rng):
    audio = jnp.asarray(rng.uniform(-1, 1, size=(2, 512, 1)).astype(np.float32))
    key = jax.random.PRNGKey(1)
    boosted = A.boost_audio(audio, 50)
    np.testing.assert_allclose(np.asarray(boosted), np.asarray(audio) * 1.5, atol=1e-6)
    ducked = A.duck_audio(audio, 90)
    np.testing.assert_allclose(np.asarray(ducked), np.asarray(audio) * 0.1, atol=1e-6)
    res = A.updown_resample(audio, 12000, sample_rate=24000)
    assert res.shape == audio.shape
    assert not np.allclose(np.asarray(res), np.asarray(audio), atol=1e-3)  # lowpassed
    cropped = A.temporal_crop(audio, 0.5, key)
    assert cropped.shape == audio.shape
    nz = (np.abs(np.asarray(cropped)) > 0).mean()
    assert 0.4 < nz < 0.6  # ~half kept


def test_mp3_training_aug_straight_through():
    """MP3 now rides the libmp3lame bridge; the train-time variant must be
    jit-compatible with an identity (straight-through) gradient."""
    if not A.mp3_available():
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="libmp3lame"):
            A.MP3Compression()
        return
    x = jnp.asarray(
        0.4 * np.sin(2 * np.pi * 440 * np.arange(24000) / 24000.0)
    ).reshape(1, -1, 1).astype(jnp.float32)

    fn = jax.jit(lambda a: A.mp3_compression_st(a, 64))
    y = fn(x)
    assert y.shape == x.shape
    assert float(jnp.abs(y - x).max()) > 1e-4  # codec actually ran

    g = jax.grad(lambda a: (A.mp3_compression_st(a, 64) ** 2).sum())(x)
    # straight-through: d/dx sum(f(x)^2) == 2 f(x) under identity backward
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(y), atol=1e-5)


def test_mimi_compression_attack(rng):
    model = Mimi(TINY)
    audio0 = jnp.zeros((1, TINY.hop_length * 8, 1))
    variables = model.init(jax.random.PRNGKey(0), audio0)
    codec = A.MimiCompression(model, variables)
    audio = jnp.asarray(rng.uniform(-0.5, 0.5, size=(1, TINY.hop_length * 8, 1)).astype(np.float32))
    out = codec(audio)
    assert out.shape[0] == 1 and out.shape[-1] == 1
    assert np.isfinite(np.asarray(out)).all()
