"""Perceptual losses for RCC finetuning.

The reference uses LPIPS (VGG16 features + learned linear heads) inside
``VQLPIPSWithDiscriminator`` with the GAN disabled
(``deps/taming/modules/losses/vqperceptual.py:33``, ``finetune.py:288-291``),
so the effective tokenizer-drift loss is ``L1 + LPIPS`` between the frozen
original decoder's output and the trainable decoder's output.

Here: a Flax VGG16-feature LPIPS whose weights load from a converted
checkpoint when available (`lpips_vgg.msgpack`), and a weight-free
Laplacian-pyramid L1 fallback so finetuning runs in hermetic/CI
environments. Both operate on NHWC images in [-1, 1].
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature blocks used by LPIPS: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_VGG_CFG = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
_IMAGENET_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_IMAGENET_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv trunk emitting the 5 LPIPS tap activations."""

    @nn.compact
    def __call__(self, x):
        taps = []
        for bi, (ch, n_convs) in enumerate(_VGG_CFG):
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), name=f"conv{bi}_{ci}")(x)
                x = nn.relu(x)
            taps.append(x)
            if bi < len(_VGG_CFG) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """LPIPS distance with learned linear heads (1x1 convs, no bias)."""

    @nn.compact
    def __call__(self, a, b):
        shift = jnp.asarray(_IMAGENET_SHIFT)
        scale = jnp.asarray(_IMAGENET_SCALE)
        feats = VGG16Features(name="vgg")
        fa = feats((a - shift) / scale)
        fb = feats((b - shift) / scale)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa * jax.lax.rsqrt((xa**2).sum(-1, keepdims=True) + 1e-10)
            nb = xb * jax.lax.rsqrt((xb**2).sum(-1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}")
            total = total + lin(d).mean(axis=(1, 2, 3))
        return total  # [B]


def laplacian_pyramid_l1(a: jnp.ndarray, b: jnp.ndarray, levels: int = 3) -> jnp.ndarray:
    """Weight-free multi-scale perceptual proxy: L1 across a blur pyramid."""

    def down(x):
        return nn.avg_pool(x, (2, 2), strides=(2, 2))

    total = jnp.abs(a - b).mean(axis=(1, 2, 3))
    for _ in range(levels):
        if min(a.shape[1], a.shape[2]) < 4:
            break
        a, b = down(a), down(b)
        total = total + jnp.abs(a - b).mean(axis=(1, 2, 3))
    return total


class PerceptualLoss:
    """LPIPS if weights are provided, pyramid-L1 otherwise. Returns [B]."""

    def __init__(self, lpips_params: Optional[dict] = None):
        self.lpips_params = lpips_params
        self.module = LPIPS() if lpips_params is not None else None

    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        if self.module is not None:
            return self.module.apply(self.lpips_params, a, b)
        return laplacian_pyramid_l1(a, b)
