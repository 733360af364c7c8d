"""Geometric attacks as jittable NHWC transforms in [0, 1].

Counterparts of ``wmar/augmentations/geometric.py`` (Rotate, UpperLeftCrop
+ResizeBack/+PadBack, HorizontalFlip, Identity). The reference routes these
through torchvision on the host per batch; here they are pure JAX functions
so the whole attack sweep stays on device.

Semantics preserved from the reference:

* ``rotate(angle)`` splits into a lossless multiple-of-90 base rotation
  (floor division, so -20 -> base -90 + residual 70, exactly like
  ``geometric.py:44-50``) and a non-expanding residual rotation with
  nearest-neighbor resampling and zero fill (torchvision defaults).
* crops anchor at the upper-left (crop the bottom/right), then either
  resize back (bilinear, antialiased) or zero-pad back.

Angles and crop factors are static arguments: the eval grid compiles one
program per (attack, param) pair and reuses it across every batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def identity(imgs: jnp.ndarray) -> jnp.ndarray:
    return imgs


def hflip(imgs: jnp.ndarray) -> jnp.ndarray:
    return imgs[:, :, ::-1, :]


def rot90_multiple(imgs: jnp.ndarray, k: int) -> jnp.ndarray:
    """Lossless rotation by k*90 degrees counter-clockwise (torchvision's
    positive-angle direction)."""
    return jnp.rot90(imgs, k=k % 4, axes=(1, 2))


def _rotate_residual(imgs: jnp.ndarray, angle_deg: float) -> jnp.ndarray:
    """Rotate by ``angle_deg`` (counter-clockwise) about the image center,
    no expand, nearest-neighbor, zero fill."""
    if angle_deg == 0:
        return imgs
    b, h, w, c = imgs.shape
    theta = jnp.deg2rad(jnp.float32(angle_deg))
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # Inverse mapping: output pixel <- rotate(-theta) of centered coords.
    y0, x0 = yy - cy, xx - cx
    src_y = cos * y0 + sin * x0 + cy
    src_x = -sin * y0 + cos * x0 + cx
    iy = jnp.round(src_y).astype(jnp.int32)
    ix = jnp.round(src_x).astype(jnp.int32)
    valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)
    out = imgs[:, iy, ix, :]
    return jnp.where(valid[None, :, :, None], out, 0.0)


def rotate(imgs: jnp.ndarray, angle: float) -> jnp.ndarray:
    """Reference-style rotation: lossless 90-base (expand) + residual."""
    base = int(angle // 90 * 90)
    residual = float(angle) - base
    if base:
        imgs = rot90_multiple(imgs, base // 90)
    return _rotate_residual(imgs, residual)


def upper_left_crop(imgs: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Keep the upper-left ``factor`` fraction (static output shape)."""
    h, w = imgs.shape[1:3]
    nh, nw = int(factor * h), int(factor * w)
    return imgs[:, :nh, :nw, :]


def upper_left_crop_resize_back(imgs: jnp.ndarray, factor: float) -> jnp.ndarray:
    if factor >= 1.0:
        return imgs
    b, h, w, c = imgs.shape
    cropped = upper_left_crop(imgs, factor)
    # Antialiased bilinear upscale back to the original size (the
    # reference uses torchvision resize(antialias=True)).
    return jax.image.resize(cropped, (b, h, w, c), method="linear", antialias=True)


def upper_left_crop_pad_back(imgs: jnp.ndarray, factor: float) -> jnp.ndarray:
    if factor >= 1.0:
        return imgs
    h, w = imgs.shape[1:3]
    cropped = upper_left_crop(imgs, factor)
    pad_h = h - cropped.shape[1]
    pad_w = w - cropped.shape[2]
    return jnp.pad(cropped, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
