"""WAM-style pixel watermark model: VAE embedder + ViT extractor.

Flax counterpart of ``deps/watermark_anything`` (``models/wam.py``,
``models/embedder.py`` VAEEmbedder, ``models/extractor.py`` +
``modules/{vae,vit,msg_processor,pixel_decoder,jnd}.py``): the embedder
encodes the image, injects a 32-bit message into the latent, and decodes an
additive watermark delta; the extractor predicts a presence mask + the 32
bits per pixel. JND attenuation bounds visibility.

This provides the trainable backbone behind
:class:`wmar_tpu.sync.wam_logic.WamSync` (quadrant synchronization), usable
from scratch via :func:`make_train_step`. For the exact ``wam_mit.pth``
architecture (VAE encoder + SAM ViT detector + JND), use
:mod:`wmar_tpu.sync.wam_exact`, which is weight-compatible and
parity-tested in ``tests/test_wam_parity.py``.
"""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp

from wmar_tpu.sync.syncseal import jnd_heatmap


@dataclasses.dataclass(frozen=True)
class WAMConfig:
    nbits: int = 32
    hidden: int = 64
    latent: int = 128
    scaling_w: float = 2.0
    image_size: int = 256


class WamEmbedder(nn.Module):
    cfg: WAMConfig

    @nn.compact
    def __call__(self, img01: jnp.ndarray, msg_bits: jnp.ndarray) -> jnp.ndarray:
        """img01 [B,H,W,3], msg [B,nbits] in {0,1} -> additive delta."""
        c = self.cfg
        x = img01 * 2.0 - 1.0
        h1 = nn.gelu(nn.Conv(c.hidden, (3, 3), strides=(2, 2), name="down1")(x))
        h2 = nn.gelu(nn.Conv(2 * c.hidden, (3, 3), strides=(2, 2), name="down2")(h1))
        z = nn.gelu(nn.Conv(c.latent, (3, 3), strides=(2, 2), name="down3")(h2))
        # msg_processor: project the message into latent channels and add
        m = nn.Dense(c.latent, name="msg_proj")(msg_bits.astype(jnp.float32) * 2.0 - 1.0)
        z = z + m[:, None, None, :]
        z = nn.gelu(nn.Conv(c.latent, (3, 3), name="mid")(z))

        def up(h, ch, name):
            b, hh, ww, _ = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, h.shape[-1]), "nearest")
            return nn.gelu(nn.Conv(ch, (3, 3), name=name)(h))

        h = up(z, 2 * c.hidden, "up1") + h2
        h = up(h, c.hidden, "up2") + h1
        h = up(h, c.hidden, "up3")
        # Small non-zero init: a zero-init delta stalls joint
        # embedder/extractor training (no bit signal to decode).
        return nn.Conv(
            3, (3, 3), kernel_init=nn.initializers.normal(1e-2), name="out"
        )(h)


class WamExtractor(nn.Module):
    cfg: WAMConfig
    vit_depth: int = 4
    vit_heads: int = 4

    @nn.compact
    def __call__(self, img01: jnp.ndarray) -> jnp.ndarray:
        """img01 [B,H,W,3] -> logits [B, 1+nbits, H, W]."""
        c = self.cfg
        x = img01 * 2.0 - 1.0
        h = nn.gelu(nn.Conv(c.hidden, (3, 3), strides=(2, 2), name="stem1")(x))
        h = nn.gelu(nn.Conv(c.latent, (3, 3), strides=(2, 2), name="stem2")(h))
        b, gh, gw, d = h.shape
        seq = h.reshape(b, gh * gw, d)
        pos = self.param("pos", nn.initializers.normal(0.02), (1, gh * gw, d))
        seq = seq + pos
        for li in range(self.vit_depth):
            hn = nn.LayerNorm(name=f"ln1_{li}")(seq)
            seq = seq + nn.MultiHeadDotProductAttention(self.vit_heads, name=f"attn_{li}")(hn)
            hn = nn.LayerNorm(name=f"ln2_{li}")(seq)
            seq = seq + nn.Dense(d, name=f"fc2_{li}")(nn.gelu(nn.Dense(2 * d, name=f"fc1_{li}")(hn)))
        h = seq.reshape(b, gh, gw, d)
        # pixel decoder: upsample back to full res
        for i, ch in enumerate([c.hidden, c.hidden]):
            bb, hh, ww, _ = h.shape
            h = jax.image.resize(h, (bb, hh * 2, ww * 2, h.shape[-1]), "nearest")
            h = nn.gelu(nn.Conv(ch, (3, 3), name=f"dec{i}")(h))
        # zero-init: predictions start at BCE-neutral logits instead of
        # saturated random values (stabilizes from-scratch training)
        logits = nn.Conv(1 + c.nbits, (3, 3), kernel_init=nn.initializers.zeros, name="head")(h)
        return logits.transpose(0, 3, 1, 2)  # [B, 1+nbits, H, W]


class WamPixelModel:
    """The ``Wam.embed``/``Wam.detect`` API (``wam.py:147,194``), pluggable
    into WamSync."""

    def __init__(self, embedder_params, extractor_params, cfg: WAMConfig = WAMConfig()):
        self.cfg = cfg
        self.embedder = WamEmbedder(cfg)
        self.extractor = WamExtractor(cfg)
        self.embedder_params = embedder_params
        self.extractor_params = extractor_params

    @staticmethod
    def init(rng: jax.Array, cfg: WAMConfig = WAMConfig()):
        k1, k2 = jax.random.split(rng)
        x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        m = jnp.zeros((1, cfg.nbits))
        return WamPixelModel(
            WamEmbedder(cfg).init(k1, x, m), WamExtractor(cfg).init(k2, x), cfg
        )

    def embed(self, img01: jnp.ndarray, msg: jnp.ndarray) -> jnp.ndarray:
        delta = self.embedder.apply(self.embedder_params, img01, msg)
        att = jnd_heatmap(img01)
        return jnp.clip(img01 + self.cfg.scaling_w * att * delta, 0.0, 1.0)

    def detect(self, img01: jnp.ndarray) -> jnp.ndarray:
        return self.extractor.apply(self.extractor_params, img01)


def make_train_step(cfg: WAMConfig, optimizer):
    """From-scratch WAM training: embed a random message under a random
    half-plane mask, light augs, then BCE on (mask, bits) per pixel —
    the core of the reference's WAM objective."""
    embedder = WamEmbedder(cfg)
    extractor = WamExtractor(cfg)

    def loss_fn(params, imgs01, rng):
        b, h, w, _ = imgs01.shape
        k_msg, k_mask, k_noise = jax.random.split(rng, 3)
        msg = jax.random.bernoulli(k_msg, 0.5, (b, cfg.nbits)).astype(jnp.float32)
        delta = embedder.apply(params["embedder"], imgs01, msg)
        att = jnd_heatmap(imgs01)
        wm = jnp.clip(imgs01 + cfg.scaling_w * att * delta, 0, 1)
        # random vertical half-plane watermark region, materialized [B,H,W,1]
        cut = jax.random.randint(k_mask, (b, 1, 1, 1), w // 4, 3 * w // 4)
        mask = jnp.broadcast_to(
            (jnp.arange(w)[None, None, :, None] < cut), (b, h, w, 1)
        ).astype(jnp.float32)
        mixed = wm * mask + imgs01 * (1 - mask)
        mixed = jnp.clip(mixed + jax.random.normal(k_noise, mixed.shape) * 0.01, 0, 1)

        logits = extractor.apply(params["extractor"], mixed)  # [B, 33, H, W]
        mask_t = mask[:, :, :, 0][:, None]  # [B, 1, H, W]
        mask_loss = optax_sigmoid_bce(logits[:, 0:1], mask_t).mean()
        bits_t = msg[:, :, None, None]
        bit_loss = (optax_sigmoid_bce(logits[:, 1:], bits_t) * mask_t).sum() / (
            mask_t.sum() * cfg.nbits + 1e-6
        )
        p_loss = (delta**2).mean()
        loss = mask_loss + bit_loss + 0.1 * p_loss
        return loss, {"loss": loss, "mask_loss": mask_loss, "bit_loss": bit_loss}

    def train_step(state, imgs01, rng):
        params, opt_state = state
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, imgs01, rng)
        import optax

        updates, opt_state = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), metrics

    return train_step


def optax_sigmoid_bce(logits, targets):
    import optax

    return optax.sigmoid_binary_cross_entropy(logits, targets)
