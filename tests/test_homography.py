"""Homography solve + perspective warp/unwarp round-trips."""

import jax
import jax.numpy as jnp
import numpy as np

from wmar_tpu.sync.homography import solve_homography, unwarp_from_corners, warp_perspective


def test_solve_identity():
    pts = jnp.asarray([[[0.0, 0.0], [31.0, 0.0], [0.0, 31.0], [31.0, 31.0]]])
    h = np.asarray(solve_homography(pts, pts))[0]
    np.testing.assert_allclose(h, np.eye(3), atol=1e-4)


def test_solve_translation():
    src = jnp.asarray([[[0.0, 0.0], [31.0, 0.0], [0.0, 31.0], [31.0, 31.0]]])
    dst = src + jnp.asarray([2.0, 5.0])
    h = np.asarray(solve_homography(src, dst))[0]
    # maps (x, y, 1) -> (x+2, y+5, 1)
    p = h @ np.array([10.0, 20.0, 1.0])
    np.testing.assert_allclose(p[:2] / p[2], [12.0, 25.0], atol=1e-3)


def test_warp_identity(rng):
    imgs = jnp.asarray(rng.uniform(0, 1, size=(2, 16, 16, 3)).astype(np.float32))
    h = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
    out = warp_perspective(imgs, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)


def test_unwarp_recovers_shift(rng):
    """Shift an image, then unwarp using the known corner displacement."""
    base = rng.uniform(0.2, 0.8, size=(1, 32, 32, 3)).astype(np.float32)
    shifted = np.zeros_like(base)
    shifted[:, 4:, 2:, :] = base[:, :-4, :-2, :]  # dy=4, dx=2
    # original corners now sit at (2,4), (33,4)... normalized by (W-1, H-1)
    corners = np.asarray(
        [[[2.0, 4.0], [33.0, 4.0], [2.0, 35.0], [33.0, 35.0]]], dtype=np.float32
    ) / 31.0
    out = np.asarray(unwarp_from_corners(jnp.asarray(shifted), jnp.asarray(corners)))
    # interior pixels should match the original
    np.testing.assert_allclose(out[:, 2:-6, 2:-4, :], base[:, 2:-6, 2:-4, :], atol=1e-2)


def test_unwarp_jits(rng):
    imgs = jnp.asarray(rng.uniform(0, 1, size=(2, 16, 16, 3)).astype(np.float32))
    corners = jnp.tile(
        jnp.asarray([[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]]), (2, 1, 1)
    )
    out = jax.jit(unwarp_from_corners)(imgs, corners)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-4)
