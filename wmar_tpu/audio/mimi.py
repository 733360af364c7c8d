"""Mimi neural audio codec: SEANet + transformer bottleneck + split RVQ.

TPU-native port of the model consumed by wmar_audio
(``wmar_audio/moshi/models/compression.py`` — SEANet encoder/decoder,
``quantization/vq.py`` — SplitResidualVectorQuantizer with 1 semantic + 7
acoustic levels, 2048-way codebooks, 24 kHz -> 12.5 fps).

Convs are causal (left-padded) like the streaming reference; the whole
encode/decode is one jitted program (the reference's streaming-state
machinery becomes `lax.scan`-friendly stateless padding since we process
whole clips at once for watermark evaluation; true streaming states can be
layered on later). Audio layout: ``[B, T, C]`` (NLC — TPU-friendly), mono.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MimiConfig:
    channels: int = 1
    dimension: int = 512
    n_filters: int = 64
    ratios: Sequence[int] = (8, 6, 5, 4)  # 24kHz -> 25Hz
    n_residual_layers: int = 1
    kernel_size: int = 7
    residual_kernel_size: int = 3
    last_kernel_size: int = 3
    dilation_base: int = 2
    n_q: int = 8
    n_q_semantic: int = 1
    cardinality: int = 2048
    codebook_dim: int = 256
    transformer_layers: int = 2
    transformer_heads: int = 8
    downsample: int = 2  # 25Hz -> 12.5Hz

    @property
    def hop_length(self) -> int:
        h = self.downsample
        for r in self.ratios:
            h *= r
        return h


MIMI_V0_1 = MimiConfig(transformer_layers=8)


class CausalConv1d(nn.Module):
    out_ch: int
    kernel: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        pad = (self.kernel - 1) * self.dilation - (self.stride - 1)
        pad = max(pad, 0)
        x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        return nn.Conv(
            self.out_ch, (self.kernel,), strides=(self.stride,),
            kernel_dilation=(self.dilation,), padding="VALID", name="conv",
        )(x)


class CausalConvTranspose1d(nn.Module):
    out_ch: int
    kernel: int
    stride: int

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        y = nn.ConvTranspose(
            self.out_ch, (self.kernel,), strides=(self.stride,), padding="VALID", name="convtr"
        )(x)
        # causal trim: keep stride*T outputs from the front
        return y[:, : x.shape[1] * self.stride, :]


class SEANetResnetBlock(nn.Module):
    dim: int
    kernel: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        h = nn.elu(x)
        h = CausalConv1d(self.dim // 2, self.kernel, dilation=self.dilation, name="conv1")(h)
        h = nn.elu(h)
        h = CausalConv1d(self.dim, 1, name="conv2")(h)
        return x + h


class BottleneckTransformer(nn.Module):
    """Small non-causal transformer over the latent frames (Mimi's
    projected transformer, ``compression.py`` encoder/decoder transformer)."""

    layers: int
    heads: int

    @nn.compact
    def __call__(self, x):  # [B, T, D]
        d = x.shape[-1]
        for li in range(self.layers):
            h = nn.LayerNorm(name=f"ln1_{li}")(x)
            attn = nn.MultiHeadDotProductAttention(num_heads=self.heads, name=f"attn_{li}")(h)
            x = x + attn
            h = nn.LayerNorm(name=f"ln2_{li}")(x)
            h = nn.Dense(4 * d, name=f"fc1_{li}")(h)
            h = nn.gelu(h)
            x = x + nn.Dense(d, name=f"fc2_{li}")(h)
        return x


class SEANetEncoder(nn.Module):
    cfg: MimiConfig

    @nn.compact
    def __call__(self, x):  # [B, T, channels] -> [B, T/prod(ratios), dimension]
        cfg = self.cfg
        mult = 1
        h = CausalConv1d(cfg.n_filters, cfg.kernel_size, name="conv_in")(x)
        for bi, ratio in enumerate(reversed(cfg.ratios)):
            for ri in range(cfg.n_residual_layers):
                h = SEANetResnetBlock(
                    mult * cfg.n_filters, cfg.residual_kernel_size,
                    cfg.dilation_base**ri, name=f"block_{bi}_{ri}",
                )(h)
            h = nn.elu(h)
            h = CausalConv1d(mult * cfg.n_filters * 2, 2 * ratio, stride=ratio, name=f"down_{bi}")(h)
            mult *= 2
        h = nn.elu(h)
        return CausalConv1d(cfg.dimension, cfg.last_kernel_size, name="conv_out")(h)


class SEANetDecoder(nn.Module):
    cfg: MimiConfig

    @nn.compact
    def __call__(self, z):  # [B, frames, dimension] -> [B, T, channels]
        cfg = self.cfg
        mult = 2 ** len(cfg.ratios)
        h = CausalConv1d(mult * cfg.n_filters, cfg.kernel_size, name="conv_in")(z)
        for bi, ratio in enumerate(cfg.ratios):
            h = nn.elu(h)
            h = CausalConvTranspose1d(mult * cfg.n_filters // 2, 2 * ratio, stride=ratio, name=f"up_{bi}")(h)
            for ri in range(cfg.n_residual_layers):
                h = SEANetResnetBlock(
                    mult * cfg.n_filters // 2, cfg.residual_kernel_size,
                    cfg.dilation_base**ri, name=f"block_{bi}_{ri}",
                )(h)
            mult //= 2
        h = nn.elu(h)
        return CausalConv1d(cfg.channels, cfg.last_kernel_size, name="conv_out")(h)


class RVQ(nn.Module):
    """Residual vector quantizer with input/output projections."""

    n_q: int
    cardinality: int
    dim: int
    codebook_dim: int

    def setup(self):
        self.input_proj = nn.Dense(self.codebook_dim, use_bias=False)
        self.output_proj = nn.Dense(self.dim, use_bias=False)
        self.codebooks = self.param(
            "codebooks",
            lambda k: jax.random.normal(k, (self.n_q, self.cardinality, self.codebook_dim)) * 0.02,
        )

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, T, dim] -> codes [B, n_q, T]."""
        y = self.input_proj(x).astype(jnp.float32)
        codes = []
        residual = y
        for q in range(self.n_q):
            emb = self.codebooks[q].astype(jnp.float32)
            d = (emb**2).sum(-1) - 2.0 * residual @ emb.T
            idx = jnp.argmin(d, axis=-1)
            codes.append(idx)
            residual = residual - emb[idx]
        return jnp.stack(codes, axis=1)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes [B, n_q, T] -> [B, T, dim]."""
        y = 0.0
        for q in range(codes.shape[1]):
            y = y + self.codebooks[q][codes[:, q]]
        return self.output_proj(y)

    def encode_decode(self, x: jnp.ndarray):
        """Straight-through encode+decode returning pre/post-quant latents
        (the Mimi RCC finetune hook, ``vq.py:300-310``)."""
        y = self.input_proj(x)
        residual = y
        quantized = 0.0
        codes = []
        for q in range(self.n_q):
            emb = self.codebooks[q]
            d = (emb**2).sum(-1) - 2.0 * residual @ emb.T
            idx = jnp.argmin(d, axis=-1)
            codes.append(idx)
            q_emb = emb[idx]
            quantized = quantized + q_emb
            residual = residual - jax.lax.stop_gradient(q_emb)
        quantized_st = y + jax.lax.stop_gradient(quantized - y)
        return jnp.stack(codes, axis=1), self.output_proj(quantized_st), y, quantized


class Mimi(nn.Module):
    """Full codec. audio [B, T, 1] in [-1, 1] <-> codes [B, n_q, frames]."""

    cfg: MimiConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = SEANetEncoder(cfg)
        self.decoder = SEANetDecoder(cfg)
        self.enc_transformer = BottleneckTransformer(cfg.transformer_layers, cfg.transformer_heads)
        self.dec_transformer = BottleneckTransformer(cfg.transformer_layers, cfg.transformer_heads)
        self.rvq_first = RVQ(cfg.n_q_semantic, cfg.cardinality, cfg.dimension, cfg.codebook_dim)
        self.rvq_rest = RVQ(
            cfg.n_q - cfg.n_q_semantic, cfg.cardinality, cfg.dimension, cfg.codebook_dim
        )

    def _to_latent(self, audio: jnp.ndarray) -> jnp.ndarray:
        z = self.encoder(audio)
        z = self.enc_transformer(z)
        if self.cfg.downsample > 1:
            z = nn.avg_pool(z, (self.cfg.downsample,), strides=(self.cfg.downsample,))
        return z

    def _from_latent(self, z: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.downsample > 1:
            b, t, d = z.shape
            z = jnp.repeat(z, self.cfg.downsample, axis=1)
        z = self.dec_transformer(z)
        return self.decoder(z)

    def encode(self, audio: jnp.ndarray) -> jnp.ndarray:
        z = self._to_latent(audio)
        codes = self.rvq_first.encode(z)
        rest = self.rvq_rest.encode(z)
        return jnp.concatenate([codes, rest], axis=1)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        nq_sem = self.cfg.n_q_semantic
        z = self.rvq_first.decode(codes[:, :nq_sem])
        z = z + self.rvq_rest.decode(codes[:, nq_sem:])
        return self._from_latent(z)

    def __call__(self, audio: jnp.ndarray):
        """Autoencode (init/training convenience)."""
        z = self._to_latent(audio)
        c1, q1, pre1, post1 = self.rvq_first.encode_decode(z)
        c2, q2, pre2, post2 = self.rvq_rest.encode_decode(z)
        rec = self._from_latent(q1 + q2)
        codes = jnp.concatenate([c1, c2], axis=1)
        return rec, codes, (pre1, post1, pre2, post2)
