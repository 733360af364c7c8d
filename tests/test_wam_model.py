"""WAM backbone: embed/detect shapes, training descent, WamSync plug-in."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from wmar_tpu.sync.wam_logic import WamSync
from wmar_tpu.sync.wam_model import WAMConfig, WamPixelModel, make_train_step

CFG = WAMConfig(nbits=32, hidden=16, latent=32, image_size=64)


@pytest.fixture(scope="module")
def model():
    return WamPixelModel.init(jax.random.PRNGKey(0), CFG)


def test_embed_detect_shapes(model, rng):
    img = jnp.asarray(rng.uniform(0, 1, size=(2, 64, 64, 3)).astype(np.float32))
    msg = jnp.asarray(rng.integers(0, 2, size=(2, 32)).astype(np.float32))
    wm = model.embed(img, msg)
    assert wm.shape == img.shape
    # small-init output conv -> low distortion at init
    assert np.abs(np.asarray(wm) - np.asarray(img)).max() < 0.25
    preds = model.detect(wm)
    assert preds.shape == (2, 33, 64, 64)


def test_training_reduces_bit_loss(rng):
    model = WamPixelModel.init(jax.random.PRNGKey(1), CFG)
    opt = optax.adam(3e-4)
    params = {"embedder": model.embedder_params, "extractor": model.extractor_params}
    state = (params, opt.init(params))
    step = jax.jit(make_train_step(CFG, opt))
    imgs = jnp.asarray(rng.uniform(0, 1, size=(4, 64, 64, 3)).astype(np.float32))
    first = None
    for i in range(15):
        state, metrics = step(state, imgs, jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics["mask_loss"])
    # localization learns within steps; bit decoding needs real training
    # scale (see examples/train_wam_sync.py)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["mask_loss"]) < first


def test_plugs_into_wamsync(model, rng):
    sync = WamSync(model, image_size=64)
    imgs = jnp.asarray(rng.uniform(-1, 1, size=(1, 64, 64, 3)).astype(np.float32))
    synced = sync.add_sync(imgs)
    assert synced.shape == imgs.shape
    out = sync.remove_sync(synced)  # untrained: low confidence -> no-op path
    assert out.shape == imgs.shape
