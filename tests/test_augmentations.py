"""Attack bank: shape/value invariants + semantics checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.augmentations import AugmentationManager
from wmar_tpu.augmentations import geometric as G
from wmar_tpu.augmentations import valuemetric as V


@pytest.fixture
def imgs(rng):
    return jnp.asarray(rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32))


def test_manager_grid_matches_reference():
    m = AugmentationManager()
    names = m.names()
    assert names == [
        "gaussian-blur", "gaussian-noise", "jpeg", "brightness",
        "rotation", "flip-h", "upperleft-crop",
    ]
    grid = dict((n, p) for n, _, p in m.augs)
    assert grid["jpeg"] == [100, 95, 85, 75, 65, 55, 45, 35, 25, 15, 5]
    assert grid["rotation"] == [-20, -15, -10, -5, 0, 5, 10, 15, 20]
    assert grid["upperleft-crop"][0] == 1.0 and grid["upperleft-crop"][-1] == 0.5


def test_all_augs_preserve_shape_and_range(imgs):
    m = AugmentationManager()
    key = jax.random.PRNGKey(0)
    for name, fn, params in m.augs:
        out = fn(imgs, params[len(params) // 2], key)
        assert out.shape == imgs.shape, name
        a = np.asarray(out)
        assert a.min() >= 0.0 and a.max() <= 1.0, name


def test_identity_params_are_noops(imgs):
    m = AugmentationManager()
    key = jax.random.PRNGKey(0)
    fns = dict((n, (f, p)) for n, f, p in m.augs)
    for name, param in [
        ("gaussian-blur", 0), ("gaussian-noise", 0), ("brightness", 1),
        ("rotation", 0), ("flip-h", 0), ("upperleft-crop", 1.0),
    ]:
        fn, _ = fns[name]
        out = fn(imgs, param, key)
        np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-6, err_msg=name)


def test_hflip_involution(imgs):
    np.testing.assert_array_equal(np.asarray(G.hflip(G.hflip(imgs))), np.asarray(imgs))


def test_rot90_is_lossless(imgs):
    out = G.rotate(imgs, 90)
    back = G.rotate(out, -90)
    # -90 -> base -90, residual 0 -> lossless
    np.testing.assert_allclose(np.asarray(back), np.asarray(imgs), atol=1e-6)


def test_small_rotation_zeroes_corners(imgs):
    out = np.asarray(G.rotate(jnp.ones_like(imgs), 10))
    assert out[0, 0, 0, 0] == 0.0  # corner rotated out -> zero fill
    assert out[0, 16, 16, 0] == 1.0  # center intact


def test_crop_resize_back_keeps_upper_left_content():
    x = jnp.zeros((1, 32, 32, 3)).at[:, :16, :16, :].set(1.0)
    out = np.asarray(G.upper_left_crop_resize_back(x, 0.5))
    # cropping to the upper-left half then resizing back: all ones
    np.testing.assert_allclose(out, 1.0, atol=1e-5)


def test_crop_pad_back_zero_fills():
    x = jnp.ones((1, 32, 32, 3))
    out = np.asarray(G.upper_left_crop_pad_back(x, 0.5))
    assert out[0, :16, :16].min() == 1.0
    assert out[0, 16:, :].max() == 0.0


def test_gaussian_noise_statistics(imgs):
    out = np.asarray(V.gaussian_noise(jnp.full_like(imgs, 0.5), 0.1, jax.random.PRNGKey(0)))
    assert abs((out - 0.5).std() - 0.1) < 0.01


def test_jpeg_diff_quality_ordering(imgs):
    hi = np.asarray(V.jpeg_diff(imgs, 95))
    lo = np.asarray(V.jpeg_diff(imgs, 5))
    x = np.asarray(imgs)
    assert np.abs(hi - x).mean() < np.abs(lo - x).mean()


def test_jpeg_diff_close_to_pil(rng):
    """In-graph JPEG approximates the real codec (same quality scale)."""
    # Smooth image (JPEG-friendly): low-frequency gradient
    yy, xx = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 32), indexing="ij")
    img = np.stack([yy, xx, (yy + xx) / 2], axis=-1).astype(np.float32)[None]
    ours = np.asarray(V.jpeg_diff(jnp.asarray(img), 75))
    pil = V.jpeg_pil(img, 75)
    assert np.abs(ours - pil).mean() < 0.03


def test_jpeg_diff_gradients_flow(imgs):
    g = jax.grad(lambda x: V.jpeg_diff(x, 50).sum())(imgs)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_blur_reduces_variance(imgs):
    out = np.asarray(V.gaussian_blur(imgs, 9))
    assert out.std() < np.asarray(imgs).std()
