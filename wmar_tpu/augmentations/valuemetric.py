"""Valuemetric attacks: blur, noise, brightness, JPEG — jittable, NHWC, [0,1].

Counterparts of ``wmar/augmentations/valuemetric.py``. JPEG comes in two
flavors:

* :func:`jpeg_diff` — an in-graph differentiable JPEG (YCbCr, 4:2:0 chroma
  subsampling, 8x8 DCT, quality-scaled quantization with straight-through
  rounding). This runs on device inside attack sweeps and RCC finetuning —
  the reference instead round-trips every image through PIL on the host per
  batch and uses a straight-through trick for grads
  (``valuemetric.py:55-59``).
* :func:`jpeg_pil` — exact PIL encode/decode on the host for strict
  eval-parity runs.
"""

from __future__ import annotations

import io

import jax
import jax.numpy as jnp
import numpy as np


_LUMA = (0.2989, 0.587, 0.114)  # torchvision rgb_to_grayscale weights


def grayscale(imgs: jnp.ndarray) -> jnp.ndarray:
    """3-channel luminance (torchvision Grayscale(num_output_channels=3))."""
    lum = (imgs * jnp.asarray(_LUMA)).sum(-1, keepdims=True)
    return jnp.repeat(lum, 3, axis=-1)


def contrast(imgs: jnp.ndarray, factor: float) -> jnp.ndarray:
    """torchvision adjust_contrast: blend with the per-image gray mean."""
    lum = (imgs * jnp.asarray(_LUMA)).sum(-1, keepdims=True)
    mean = lum.mean(axis=(1, 2, 3), keepdims=True)
    return jnp.clip(mean + factor * (imgs - mean), 0.0, 1.0)


def saturation(imgs: jnp.ndarray, factor: float) -> jnp.ndarray:
    """torchvision adjust_saturation: blend with grayscale."""
    return jnp.clip(grayscale(imgs) + factor * (imgs - grayscale(imgs)), 0.0, 1.0)


def hue(imgs: jnp.ndarray, shift: float) -> jnp.ndarray:
    """Hue rotation by ``shift`` in [-0.5, 0.5] turns (HSV round trip)."""
    r, g, b = imgs[..., 0], imgs[..., 1], imgs[..., 2]
    maxc = jnp.max(imgs, axis=-1)
    minc = jnp.min(imgs, axis=-1)
    v = maxc
    cr = maxc - minc
    s = cr / jnp.maximum(maxc, 1e-8)
    safe_cr = jnp.maximum(cr, 1e-8)
    rc = (maxc - r) / safe_cr
    gc = (maxc - g) / safe_cr
    bc = (maxc - b) / safe_cr
    h = jnp.where(maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(cr < 1e-8, 0.0, h)
    h = (h + shift) % 1.0
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r2, g2, b2], axis=-1)


def median_filter(imgs: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """kxk median filter with reflect padding (syncseal valuemetric.py:70-94)."""
    k = int(kernel_size)
    pad = k // 2
    x = jnp.pad(imgs, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    h, w = imgs.shape[1], imgs.shape[2]
    patches = jnp.stack(
        [x[:, i : i + h, j : j + w, :] for i in range(k) for j in range(k)], axis=-1
    )
    return jnp.median(patches, axis=-1)


def gaussian_noise(imgs: jnp.ndarray, std: float, rng: jax.Array) -> jnp.ndarray:
    noise = jax.random.normal(rng, imgs.shape, imgs.dtype) * std
    return jnp.clip(imgs + noise, 0.0, 1.0)


def brightness(imgs: jnp.ndarray, factor: float) -> jnp.ndarray:
    return jnp.clip(imgs * factor, 0.0, 1.0)


def _gaussian_kernel1d(kernel_size: int) -> jnp.ndarray:
    # torchvision default sigma for gaussian_blur.
    sigma = 0.3 * ((kernel_size - 1) * 0.5 - 1) + 0.8
    x = jnp.arange(kernel_size, dtype=jnp.float32) - (kernel_size - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_blur(imgs: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Separable depthwise blur with reflect padding (torchvision-style)."""
    if kernel_size <= 0:
        return imgs
    if kernel_size % 2 == 0:
        kernel_size += 1
    k = _gaussian_kernel1d(kernel_size)
    pad = kernel_size // 2
    c = imgs.shape[-1]
    x = jnp.pad(imgs, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    kh = jnp.tile(k.reshape(kernel_size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, kernel_size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c)
    return jnp.clip(x, 0.0, 1.0)


# ---------------------------------------------------------------------------
# JPEG
# ---------------------------------------------------------------------------

# Standard Annex-K quantization tables.
_Q_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
)
_Q_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float32,
)


def _quality_tables(quality: int):
    quality = max(1, min(int(quality), 100))
    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    luma = np.clip(np.floor((_Q_LUMA * scale + 50) / 100), 1, 255)
    chroma = np.clip(np.floor((_Q_CHROMA * scale + 50) / 100), 1, 255)
    return jnp.asarray(luma), jnp.asarray(chroma)


def _dct_matrix() -> jnp.ndarray:
    n = 8
    k = np.arange(n)
    m = np.sqrt(2.0 / n) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n))
    m[0] *= 1.0 / np.sqrt(2.0)
    return jnp.asarray(m.astype(np.float32))  # [8, 8], X_dct = M x M^T


def _blockify(x: jnp.ndarray):
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(-1, 8, 8)


def _unblockify(x: jnp.ndarray, b: int, h: int, w: int):
    x = x.reshape(b, h // 8, w // 8, 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, h, w)


def _st_round(x: jnp.ndarray) -> jnp.ndarray:
    """Straight-through round: identity gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def _jpeg_channel(chan: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """chan [B, H, W] centered at 0 (i.e. value-128 space)."""
    b, h, w = chan.shape
    m = _dct_matrix()
    blocks = _blockify(chan)
    coef = jnp.einsum("ij,bjk,lk->bil", m, blocks, m)
    q = _st_round(coef / table)
    deq = q * table
    rec = jnp.einsum("ji,bjk,kl->bil", m, deq, m)
    return _unblockify(rec, b, h, w)


def jpeg_diff(imgs: jnp.ndarray, quality: int, subsample: bool = True) -> jnp.ndarray:
    """Differentiable JPEG round-trip on NHWC [0,1] images.

    Arbitrary sizes: images are reflect-padded to block multiples and
    cropped back (real JPEG pads with edge replication too). Chroma
    subsampling is skipped for images smaller than 16 px.
    """
    h0, w0 = imgs.shape[1:3]
    subsample = subsample and h0 >= 16 and w0 >= 16
    mult = 16 if subsample else 8
    pad_h, pad_w = (-h0) % mult, (-w0) % mult
    if pad_h or pad_w:
        imgs = jnp.pad(imgs, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge")
    luma_t, chroma_t = _quality_tables(quality)
    x = imgs * 255.0
    r, g, b_ = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b_
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b_ + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b_ + 128.0

    y = _jpeg_channel(y - 128.0, luma_t) + 128.0
    if subsample:
        bb, h, w = cb.shape
        cb_d = jax.image.resize(cb, (bb, h // 2, w // 2), method="linear")
        cr_d = jax.image.resize(cr, (bb, h // 2, w // 2), method="linear")
        cb_d = _jpeg_channel(cb_d - 128.0, chroma_t) + 128.0
        cr_d = _jpeg_channel(cr_d - 128.0, chroma_t) + 128.0
        cb = jax.image.resize(cb_d, (bb, h, w), method="linear")
        cr = jax.image.resize(cr_d, (bb, h, w), method="linear")
    else:
        cb = _jpeg_channel(cb - 128.0, chroma_t) + 128.0
        cr = _jpeg_channel(cr - 128.0, chroma_t) + 128.0

    cb, cr = cb - 128.0, cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    out = jnp.stack([r, g, b_], axis=-1) / 255.0
    out = out[:, :h0, :w0, :]
    return jnp.clip(out, 0.0, 1.0)


def jpeg_pil(imgs_np: np.ndarray, quality: int) -> np.ndarray:
    """Exact PIL JPEG round-trip. Host-side, NHWC uint8-range [0,1] floats."""
    from PIL import Image  # host-only import

    out = np.empty_like(imgs_np)
    for i in range(imgs_np.shape[0]):
        arr = np.clip(imgs_np[i] * 255.0 + 0.5, 0, 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=int(quality))
        buf.seek(0)
        out[i] = np.asarray(Image.open(buf), dtype=np.float32) / 255.0
    return out
