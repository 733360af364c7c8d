"""Neural compression codecs + DiffPure at tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.augmentations.diffpure import ADMConfig, ADMUNet, DiffPure, linear_betas
from wmar_tpu.augmentations.neural import (
    BMSHJ2018Factorized,
    BMSHJ2018Hyperprior,
    BMSHJConfig,
    KLVAECompression,
    NeuralCompression,
)

TINY_ADM = ADMConfig(
    image_size=16, model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
    attention_resolutions=(8,), num_head_channels=16, diffusion_steps=50,
)


def test_bmshj_factorized_roundtrip(rng):
    cfg = BMSHJConfig(n=32, m=48)
    model = BMSHJ2018Factorized(cfg)
    x = jnp.asarray(rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    rec, bpp = model.apply(params, x)
    assert rec.shape == x.shape
    assert 0 <= float(bpp) < 50
    assert np.asarray(rec).min() >= 0 and np.asarray(rec).max() <= 1


def test_bmshj_hyperprior_roundtrip(rng):
    cfg = BMSHJConfig(n=32, m=48)
    model = BMSHJ2018Hyperprior(cfg)
    # hyperprior needs input size divisible by 64 (y grid divisible by 4)
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    rec, bpp = model.apply(params, x)
    assert rec.shape == x.shape
    assert np.isfinite(float(bpp))


def test_neural_compression_from_name(rng):
    nc = NeuralCompression.from_name("bmshj2018-factorized-q=3", image_size=32)
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 32, 32, 3)).astype(np.float32))
    rec = nc(x)
    assert rec.shape == x.shape
    rec2, bpp = nc(x, return_bpp=True)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(rec2))


def test_klvae_slot(rng):
    model = KLVAECompression(resolution=32)
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    rec, _ = model.apply(params, x)
    assert rec.shape == x.shape


def test_adm_unet_shapes(rng):
    unet = ADMUNet(TINY_ADM)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 16, 16, 3)).astype(np.float32))
    t = jnp.array([5, 20], dtype=jnp.int32)
    params = unet.init(jax.random.PRNGKey(0), x, t)
    out = unet.apply(params, x, t)
    assert out.shape == (2, 16, 16, 6)  # eps + learned variance


def test_diffpure_runs_and_stays_in_range(rng):
    unet = ADMUNet(TINY_ADM)
    x01 = jnp.asarray(rng.uniform(0, 1, size=(1, 16, 16, 3)).astype(np.float32))
    params = unet.init(jax.random.PRNGKey(0), x01 * 2 - 1, jnp.array([0]))
    dp = DiffPure(unet, params, steps=0.1)
    out = jax.jit(lambda x, r: dp(x, 0.1, r))(x01, jax.random.PRNGKey(1))
    assert out.shape == x01.shape
    a = np.asarray(out)
    assert a.min() >= 0.0 and a.max() <= 1.0
    # more steps = more destruction (vs zero-model this is stochastic; just
    # check it changes the image)
    assert not np.allclose(a, np.asarray(x01), atol=1e-3)


def test_betas_schedule():
    b = linear_betas(1000)
    assert b[0] == pytest.approx(1e-4, rel=1e-6)
    assert b[-1] == pytest.approx(0.02, rel=1e-6)
    assert (np.diff(b) > 0).all()


def test_mbt2018_mean_roundtrip(rng):
    from wmar_tpu.augmentations.neural import MBT2018Mean

    model = MBT2018Mean(BMSHJConfig(n=32, m=48))
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    rec, bpp = model.apply(params, x)
    assert rec.shape == x.shape and np.isfinite(float(bpp))


def test_cheng2020_roundtrip(rng):
    from wmar_tpu.augmentations.neural import Cheng2020Anchor

    model = Cheng2020Anchor(n=32)
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    rec, bpp = model.apply(params, x)
    assert rec.shape == x.shape and np.isfinite(float(bpp))


def test_all_reference_codec_names_construct():
    names = [
        "bmshj2018-factorized-q=1", "bmshj2018-hyperprior-q=3",
        "mbt2018-mean-q=6", "mbt2018-q=1", "cheng2020-anchor-q=3",
        "cheng2020-attn-q=6", "diffusers-sd-vae-ft-ema",
    ]
    for n in names:
        NeuralCompression.from_name(n, image_size=64)
