"""MaskGit-VQGAN tokenizer (RAR's image tokenizer), Flax/NHWC.

Re-implements the architecture behind RAR's ``PretrainedTokenizer``
(reference: ``deps/rar/modeling/modules/maskgit_vqgan.py``,
``deps/rar/modeling/titok.py:41-89``): attention-free VQGAN with avg-pool
downsampling and nearest-neighbor upsampling; codebook 1024 x 256; images in
[0, 1]. Config: hidden 128, mult (1,1,2,2,4), 2 res blocks, z_channels 256.

Faithfulness note: the reference ResnetBlock applies its 1x1 ``nin_shortcut``
to the block *output*, not the input (``maskgit_vqgan.py:75-90`` — an
upstream open-muse quirk baked into the released checkpoint), i.e.
``out = h + conv1x1(h)`` when channels change. We replicate that exactly so
converted weights reproduce the reference tokenizer.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MaskGitVQConfig:
    resolution: int = 256
    num_channels: int = 3
    hidden_channels: int = 128
    channel_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 256
    n_embed: int = 1024
    embed_dim: int = 256
    dropout: float = 0.0

    def __post_init__(self):
        # MaskGit has no quant_conv: the encoder output IS the codebook space.
        assert self.z_channels == self.embed_dim, "z_channels must equal embed_dim"

    @property
    def num_resolutions(self) -> int:
        return len(self.channel_mult)

    @property
    def codes_per_side(self) -> int:
        return self.resolution // 2 ** (self.num_resolutions - 1)


MASKGIT_IMAGENET_F16 = MaskGitVQConfig()


def _norm():
    return nn.GroupNorm(num_groups=32, epsilon=1e-6)


class MGResnetBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = _norm()(x)
        h = nn.swish(h)
        h = nn.Conv(self.out_ch, (3, 3), use_bias=False, name="conv1")(h)
        h = _norm()(h)
        h = nn.swish(h)
        h = nn.Conv(self.out_ch, (3, 3), use_bias=False, name="conv2")(h)
        if in_ch != self.out_ch:
            # Reference quirk: shortcut taken from the block output.
            res = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="nin_shortcut")(h)
        else:
            res = x
        return h + res


class MGEncoder(nn.Module):
    cfg: MaskGitVQConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.hidden_channels, (3, 3), use_bias=False, name="conv_in")(x)
        for i_level, mult in enumerate(cfg.channel_mult):
            for i_block in range(cfg.num_res_blocks):
                h = MGResnetBlock(cfg.hidden_channels * mult, name=f"down_{i_level}_block_{i_block}")(h)
            if i_level != cfg.num_resolutions - 1:
                h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        mid_ch = cfg.hidden_channels * cfg.channel_mult[-1]
        for i_block in range(cfg.num_res_blocks):
            h = MGResnetBlock(mid_ch, name=f"mid_block_{i_block}")(h)
        h = _norm()(h)
        h = nn.swish(h)
        return nn.Conv(cfg.z_channels, (1, 1), name="conv_out")(h)


class MGDecoder(nn.Module):
    cfg: MaskGitVQConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        block_in = cfg.hidden_channels * cfg.channel_mult[-1]
        h = nn.Conv(block_in, (3, 3), name="conv_in")(z)
        for i_block in range(cfg.num_res_blocks):
            h = MGResnetBlock(block_in, name=f"mid_block_{i_block}")(h)
        for i_level in reversed(range(cfg.num_resolutions)):
            out_ch = cfg.hidden_channels * cfg.channel_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = MGResnetBlock(out_ch, name=f"up_{i_level}_block_{i_block}")(h)
            if i_level != 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, 2 * hh, 2 * ww, c), method="nearest")
                h = nn.Conv(c, (3, 3), name=f"up_{i_level}_upsample_conv")(h)
        h = _norm()(h)
        h = nn.swish(h)
        return nn.Conv(cfg.num_channels, (3, 3), name="conv_out")(h)


class MaskGitVQGAN(nn.Module):
    """Tokenizer API mirroring ``PretrainedTokenizer``: [0,1] images.

    ``encode_codes``/``decode_codes`` use the [-1, 1] convention of the ARMM
    wrapper boundary (``rar_wrapper.py:109-128`` does the same conversion).
    """

    cfg: MaskGitVQConfig

    def setup(self):
        self.encoder = MGEncoder(self.cfg)
        self.decoder = MGDecoder(self.cfg)
        self.embedding = self.param(
            "embedding",
            lambda key: jax.random.uniform(
                key,
                (self.cfg.n_embed, self.cfg.embed_dim),
                minval=-1.0 / self.cfg.n_embed,
                maxval=1.0 / self.cfg.n_embed,
            ),
        )

    def nearest(self, z: jnp.ndarray) -> jnp.ndarray:
        flat = z.reshape(-1, self.cfg.embed_dim).astype(jnp.float32)
        emb = self.embedding.astype(jnp.float32)
        d = (emb**2).sum(-1)[None, :] - 2.0 * flat @ emb.T
        return jnp.argmin(d, axis=-1).reshape(z.shape[:-1])

    def encode_latent(self, images_01: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(images_01)

    def encode_codes(self, images: jnp.ndarray) -> jnp.ndarray:
        """images NHWC in [-1, 1] -> [B, tokens]."""
        z = self.encoder((images + 1.0) / 2.0)
        return self.nearest(z).reshape(images.shape[0], -1)

    def decode_codes(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes [B, tokens] -> images NHWC in [-1, 1]."""
        side = self.cfg.codes_per_side
        z_q = self.embedding[codes.reshape(codes.shape[0], side, side)]
        rec = self.decoder(z_q)
        return jnp.clip(rec, 0.0, 1.0) * 2.0 - 1.0

    def quantize_st(self, z: jnp.ndarray):
        """Straight-through quantization for finetuning."""
        idx = self.nearest(z)
        z_q = self.embedding[idx]
        codebook_loss = jnp.mean((jax.lax.stop_gradient(z) - z_q) ** 2)
        commit_loss = 0.25 * jnp.mean((z - jax.lax.stop_gradient(z_q)) ** 2)
        z_q = z + jax.lax.stop_gradient(z_q - z)
        return z_q, idx, (codebook_loss, commit_loss)

    def __call__(self, images: jnp.ndarray):
        z = self.encoder((images + 1.0) / 2.0)
        z_q, idx, losses = self.quantize_st(z)
        rec = self.decoder(z_q)
        return jnp.clip(rec, 0.0, 1.0) * 2.0 - 1.0, idx, losses
