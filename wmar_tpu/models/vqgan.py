"""Taming-style VQGAN tokenizer as XLA conv stacks (Flax, NHWC).

Re-implements the architecture consumed by wmar's Taming and Chameleon paths
(reference: ``deps/taming/modules/diffusionmodules/model.py`` Encoder/Decoder,
``deps/taming/modules/vqvae/quantize.py`` VectorQuantizer2,
``deps/chameleon/inference/vqgan.py``): ResNet blocks with GroupNorm(32) +
swish, optional single-head attention at selected resolutions, asymmetric-pad
stride-2 downsampling, nearest-neighbor upsampling.

TPU notes: NHWC layout end-to-end (XLA's preferred conv layout), f32 params
with optional bf16 activations. The encode path's nearest-codebook search is
one big ``[N, e_dim] x [e_dim, n_e]`` matmul on the MXU.

Shape/vocab facts from the reference: Taming ImageNet f=16 (16384 codes,
e_dim 256, 256px, attn at 16); Chameleon VQGAN (8192 codes, 512px, no attn).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VQGANConfig:
    resolution: int = 256
    in_channels: int = 3
    out_channels: int = 3
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    z_channels: int = 256
    n_embed: int = 16384
    embed_dim: int = 256
    dropout: float = 0.0
    double_z: bool = False
    norm_groups: int = 32  # GroupNorm groups (taming/WAM 32; syncseal VAE 16)
    tanh_out: bool = False  # decoder tail tanh (syncseal vae.py VAEDecoder)

    @property
    def num_resolutions(self) -> int:
        return len(self.ch_mult)

    @property
    def downsample_factor(self) -> int:
        return 2 ** (self.num_resolutions - 1)

    @property
    def codes_per_side(self) -> int:
        return self.resolution // self.downsample_factor


TAMING_IMAGENET_F16 = VQGANConfig()
CHAMELEON_F16 = VQGANConfig(resolution=512, n_embed=8192, attn_resolutions=())


def _norm(groups: int = 32):
    return nn.GroupNorm(num_groups=groups, epsilon=1e-6)


class ResnetBlock(nn.Module):
    out_ch: int
    dropout: float = 0.0
    groups: int = 32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_ch = x.shape[-1]
        h = _norm(self.groups)(x)
        h = nn.swish(h)
        h = nn.Conv(self.out_ch, (3, 3), name="conv1")(h)
        h = _norm(self.groups)(h)
        h = nn.swish(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_ch, (3, 3), name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over the spatial grid (1x1 convs)."""

    groups: int = 32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = _norm(self.groups)(x)
        q = nn.Conv(c, (1, 1), name="q")(hn).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), name="k")(hn).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), name="v")(hn).reshape(b, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) * (c**-0.5), axis=-1
        ).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        return x + nn.Conv(c, (1, 1), name="proj_out")(out)


class Downsample(nn.Module):
    """Taming's stride-2 conv with asymmetric (0,1,0,1) padding."""

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding="VALID", name="conv")(x)


class Upsample(nn.Module):
    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        return nn.Conv(c, (3, 3), name="conv")(x)


class Encoder(nn.Module):
    cfg: VQGANConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        curr_res = cfg.resolution
        h = nn.Conv(cfg.ch, (3, 3), name="conv_in")(x)
        g = cfg.norm_groups
        for i_level, mult in enumerate(cfg.ch_mult):
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock(cfg.ch * mult, cfg.dropout, g,
                                name=f"down_{i_level}_block_{i_block}")(h, deterministic)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(g, name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != cfg.num_resolutions - 1:
                h = Downsample(name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
        h = ResnetBlock(h.shape[-1], cfg.dropout, g, name="mid_block_1")(h, deterministic)
        h = AttnBlock(g, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], cfg.dropout, g, name="mid_block_2")(h, deterministic)
        h = _norm(g)(h)
        h = nn.swish(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(out_ch, (3, 3), name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VQGANConfig

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        cfg = self.cfg
        block_in = cfg.ch * cfg.ch_mult[-1]
        g = cfg.norm_groups
        h = nn.Conv(block_in, (3, 3), name="conv_in")(z)
        h = ResnetBlock(block_in, cfg.dropout, g, name="mid_block_1")(h, deterministic)
        h = AttnBlock(g, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, cfg.dropout, g, name="mid_block_2")(h, deterministic)
        curr_res = cfg.codes_per_side
        for i_level in reversed(range(cfg.num_resolutions)):
            out_ch = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(out_ch, cfg.dropout, g, name=f"up_{i_level}_block_{i_block}")(
                    h, deterministic
                )
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(g, name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        h = _norm(g)(h)
        h = nn.swish(h)
        h = nn.Conv(cfg.out_channels, (3, 3), name="conv_out")(h)
        return jnp.tanh(h) if cfg.tanh_out else h


class VectorQuantizer(nn.Module):
    """Nearest-neighbor codebook quantizer (VectorQuantizer2 semantics)."""

    n_embed: int
    embed_dim: int
    beta: float = 0.25

    def setup(self):
        self.embedding = self.param(
            "embedding",
            lambda key: jax.random.uniform(
                key, (self.n_embed, self.embed_dim), minval=-1.0 / self.n_embed, maxval=1.0 / self.n_embed
            ),
        )

    def nearest(self, z: jnp.ndarray) -> jnp.ndarray:
        """``z [..., embed_dim] -> indices [...]`` via one MXU matmul."""
        flat = z.reshape(-1, self.embed_dim).astype(jnp.float32)
        emb = self.embedding.astype(jnp.float32)
        # argmin ||z - e||^2 = argmin (||e||^2 - 2 z.e)
        d = (emb**2).sum(-1)[None, :] - 2.0 * flat @ emb.T
        idx = jnp.argmin(d, axis=-1)
        return idx.reshape(z.shape[:-1])

    def lookup(self, indices: jnp.ndarray) -> jnp.ndarray:
        return self.embedding[indices]

    def __call__(self, z: jnp.ndarray):
        """Quantize with straight-through estimator.

        Returns ``(z_q, indices, losses)`` where losses = (codebook, commit).
        """
        idx = self.nearest(z)
        z_q = self.lookup(idx)
        codebook_loss = jnp.mean((jax.lax.stop_gradient(z) - z_q) ** 2)
        commit_loss = jnp.mean((z - jax.lax.stop_gradient(z_q)) ** 2)
        z_q = z + jax.lax.stop_gradient(z_q - z)
        return z_q, idx, (codebook_loss, self.beta * commit_loss)


class TamingVQGAN(nn.Module):
    """Full tokenizer: encode/decode/codes round-trip, RCC-finetunable.

    Mirrors ``deps/taming/models/vqgan.py:16-84`` (encode/decode/decode_code)
    plus the cloned ``watermark_encoder`` used for RCC finetuning
    (``wmar/models/armm_wrapper.py:107-121``): when ``use_watermark_encoder``
    the re-encode pass runs through a separate encoder copy whose params can
    be trained while the sampling encoder stays frozen.
    """

    cfg: VQGANConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        self.quantize = VectorQuantizer(self.cfg.n_embed, self.cfg.embed_dim)
        self.quant_conv = nn.Conv(self.cfg.embed_dim, (1, 1))
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1))

    def encode_latent(self, images: jnp.ndarray) -> jnp.ndarray:
        """images NHWC in [-1, 1] -> pre-quantization latents [B,h,w,e]."""
        return self.quant_conv(self.encoder(images))

    def encode_codes(self, images: jnp.ndarray) -> jnp.ndarray:
        """images NHWC in [-1, 1] -> token grid [B, h*w] (row-major)."""
        z = self.encode_latent(images)
        idx = self.quantize.nearest(z)
        return idx.reshape(idx.shape[0], -1)

    def decode_latent(self, z_q: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z_q))

    def decode_codes(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes [B, h*w] -> images NHWC in [-1, 1] (unclamped)."""
        b = codes.shape[0]
        side = self.cfg.codes_per_side
        z_q = self.quantize.lookup(codes.reshape(b, side, side))
        return self.decode_latent(z_q)

    def __call__(self, images: jnp.ndarray):
        """Standard autoencode pass (init/training convenience)."""
        z = self.encode_latent(images)
        z_q, idx, losses = self.quantize(z)
        rec = self.decode_latent(z_q)
        return rec, idx, losses
