"""SyncSeal: embed/detect/unwarp shapes + corner-loss training step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from wmar_tpu.sync.syncseal import (
    CANON_CORNERS,
    SyncSealConfig,
    SyncSealModel,
    apply_corner_warp,
    jnd_heatmap,
    make_train_step,
    random_corner_homography,
)

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"

CFG = SyncSealConfig(image_size=32, scaling_w=0.4)


@pytest.fixture(scope="module")
def model():
    return SyncSealModel.init(jax.random.PRNGKey(0), CFG)


@pytest.fixture
def imgs(rng):
    return jnp.asarray(rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32))


def test_embed_detect_shapes(model, imgs):
    synced = model.add_sync(imgs)
    assert synced.shape == imgs.shape
    corners = model.detect(synced)
    assert corners.shape == (2, 4, 2)
    a = np.asarray(corners)
    assert (a >= 0).all() and (a <= 1).all()


def test_embed_is_imperceptible_scale(model, imgs):
    synced = model.add_sync(imgs)
    # zero-init output conv -> near-zero delta at init
    assert np.abs(np.asarray(synced - imgs)).max() < 0.05


def test_jnd_heatmap_range(imgs):
    att = jnd_heatmap((imgs + 1) / 2)
    a = np.asarray(att)
    assert a.shape == (2, 32, 32, 1)
    assert a.min() >= 0.05 and a.max() <= 1.0


def test_corner_warp_identity(imgs):
    x01 = (imgs + 1) / 2
    corners = jnp.tile(jnp.asarray(CANON_CORNERS)[None], (2, 1, 1))
    out = apply_corner_warp(x01, corners)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x01), atol=1e-4)


def test_corner_warp_roundtrip():
    """warp by known corners then unwarp_from_corners restores the frame.

    Smooth test image: double bilinear resampling legitimately destroys
    i.i.d. noise, so use a gradient (like natural image content)."""
    from wmar_tpu.sync.homography import unwarp_from_corners

    yy, xx = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 32), indexing="ij")
    x01 = jnp.asarray(
        np.tile(np.stack([yy, xx, (yy + xx) / 2], -1)[None], (2, 1, 1, 1)).astype(np.float32)
    )
    corners = jnp.tile(
        jnp.asarray([[[0.1, 0.05], [0.95, 0.1], [0.05, 0.9], [0.9, 0.95]]], jnp.float32),
        (2, 1, 1),
    )
    warped = apply_corner_warp(x01, corners)
    restored = unwarp_from_corners(warped, corners)
    # interior reconstruction close (bilinear resampling x2)
    err = np.abs(np.asarray(restored - x01))[:, 6:-6, 6:-6]
    assert err.mean() < 0.1


def test_remove_sync_runs(model, imgs):
    out = model.remove_sync(model.add_sync(imgs))
    assert out.shape == imgs.shape


def test_training_step_reduces_corner_loss(model, rng):
    opt = optax.adam(2e-4)
    params = {"embedder": model.embedder_params, "extractor": model.extractor_params}
    state = (params, opt.init(params))
    step = jax.jit(make_train_step(model, opt))
    imgs01 = jnp.asarray(rng.uniform(0, 1, size=(4, 32, 32, 3)).astype(np.float32))
    first = None
    for i in range(12):
        state, metrics = step(state, imgs01, jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics["corner_mae"])
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["corner_mae"]) < first


def test_save_load_roundtrip(model, tmp_path):
    p = str(tmp_path / "syncseal.msgpack")
    model.save(p)
    loaded = SyncSealModel.load(p, CFG)
    l1 = jax.tree.leaves(model.embedder_params)[0]
    l2 = jax.tree.leaves(loaded.embedder_params)[0]
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_evaluate_sync(model, rng):
    from wmar_tpu.sync.syncseal import evaluate_sync

    imgs01 = jnp.asarray(rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32))
    report = evaluate_sync(model, imgs01, jax.random.PRNGKey(0))
    assert report["psnr"] > 20
    assert len(report["grid"]) == 3
    for row in report["grid"]:
        assert 0 <= row["corner_mae"] <= 1
