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
from typing import Optional, Sequence

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
    transformer_ff: Optional[int] = None  # default 4*dimension (real Mimi: 2048)
    transformer_context: int = 250  # causal attention window (loaders.py:70)
    layer_scale: float = 0.01
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
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        pad = (self.kernel - 1) * self.dilation - (self.stride - 1)
        pad = max(pad, 0)
        x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        return nn.Conv(
            self.out_ch, (self.kernel,), strides=(self.stride,),
            kernel_dilation=(self.dilation,), padding="VALID", name="conv",
            use_bias=self.use_bias,
        )(x)


class CausalConvTranspose1d(nn.Module):
    """torch ConvTranspose1d(k, s) with the causal right-trim (conv.py:297-
    380, trim_right_ratio=1): an lhs-dilated conv over a spatially flipped
    kernel (stored flipped — the converter flips torch weights)."""

    out_ch: int
    kernel: int
    stride: int
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        in_ch = x.shape[-1]
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, in_ch // self.groups, self.out_ch),
        )
        y = jax.lax.conv_general_dilated(
            x, k, (1,), ((self.kernel - 1, self.kernel - 1),),
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.out_ch,))
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
    """Mimi's bottleneck StreamingTransformer, weight-compatible with the
    released checkpoint (``moshi/modules/transformer.py`` with
    ``loaders.py:64-79`` kwargs): causal rope attention with a context
    window, fused in_proj (no bias), LayerScale(0.01) residuals, LayerNorm,
    and a gating="none" FFN (linear1 -> gelu -> linear2, no biases)."""

    layers: int
    heads: int
    ff: Optional[int] = None
    context: int = 250
    layer_scale: float = 0.01

    @nn.compact
    def __call__(self, x):  # [B, T, D]
        from wmar_tpu.models.llama import apply_rope

        b, t, d = x.shape
        ff = self.ff or 4 * d
        hd = d // self.heads
        positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
        ar = jnp.arange(t)
        delta = ar[:, None] - ar[None, :]
        mask = (delta >= 0) & (delta < self.context)  # causal + window
        for li in range(self.layers):
            h = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{li}")(x)
            qkv = nn.Dense(3 * d, use_bias=False, name=f"in_proj_{li}")(h)
            q, k, v = jnp.split(qkv.reshape(b, t, 3, self.heads, hd)
                                .transpose(2, 0, 1, 3, 4), 3, axis=0)
            q, k, v = q[0], k[0], v[0]  # [B, t, H, hd]
            q = apply_rope(q, positions, 10000.0)
            k = apply_rope(k, positions, 10000.0)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * hd**-0.5
            s = jnp.where(mask[None, None], s, jnp.float32(-1e30))
            a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, t, d)
            out = nn.Dense(d, use_bias=False, name=f"out_proj_{li}")(out)
            ls1 = self.param(f"ls1_{li}", nn.initializers.constant(self.layer_scale), (d,))
            x = x + ls1 * out
            h = nn.LayerNorm(epsilon=1e-5, name=f"norm2_{li}")(x)
            h = nn.Dense(ff, use_bias=False, name=f"linear1_{li}")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(d, use_bias=False, name=f"linear2_{li}")(h)
            ls2 = self.param(f"ls2_{li}", nn.initializers.constant(self.layer_scale), (d,))
            x = x + ls2 * h
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

    def encode_decode_all(self, x: jnp.ndarray):
        """Like :meth:`encode_decode` but also returns per-layer latents in
        codebook space — the reference's ``encode_all``/``decode_all``
        (``core_vq.py:530-556``): ``all_pre[i]`` is the residual entering
        layer i, ``all_post[i]`` its quantized codebook vector.

        Returns ``(codes [B,nq,T], out [B,T,dim], all_pre [nq,B,T,cd],
        all_post [nq,B,T,cd])``."""
        y = self.input_proj(x)
        residual = y
        quantized = 0.0
        codes, pres, posts = [], [], []
        for q in range(self.n_q):
            emb = self.codebooks[q]
            pres.append(residual)
            d = (emb**2).sum(-1) - 2.0 * residual @ emb.T
            idx = jnp.argmin(d, axis=-1)
            codes.append(idx)
            q_emb = emb[idx]
            posts.append(q_emb)
            quantized = quantized + q_emb
            residual = residual - jax.lax.stop_gradient(q_emb)
        quantized_st = y + jax.lax.stop_gradient(quantized - y)
        return (jnp.stack(codes, axis=1), self.output_proj(quantized_st),
                jnp.stack(pres), jnp.stack(posts))


class Mimi(nn.Module):
    """Full codec. audio [B, T, 1] in [-1, 1] <-> codes [B, n_q, frames]."""

    cfg: MimiConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = SEANetEncoder(cfg)
        self.decoder = SEANetDecoder(cfg)
        kw = dict(ff=cfg.transformer_ff, context=cfg.transformer_context,
                  layer_scale=cfg.layer_scale)
        self.enc_transformer = BottleneckTransformer(
            cfg.transformer_layers, cfg.transformer_heads, **kw)
        self.dec_transformer = BottleneckTransformer(
            cfg.transformer_layers, cfg.transformer_heads, **kw)
        self.rvq_first = RVQ(cfg.n_q_semantic, cfg.cardinality, cfg.dimension, cfg.codebook_dim)
        self.rvq_rest = RVQ(
            cfg.n_q - cfg.n_q_semantic, cfg.cardinality, cfg.dimension, cfg.codebook_dim
        )
        if cfg.downsample > 1:
            # learned causal resampling (compression.py:200-217 with
            # resample_method="conv"; upsample is channel-wise, the
            # reference's `upsample_channel_wise_bug`)
            ds = cfg.downsample
            self.downsample_conv = CausalConv1d(cfg.dimension, 2 * ds, stride=ds,
                                                use_bias=False)
            self.upsample_conv = CausalConvTranspose1d(
                cfg.dimension, 2 * ds, stride=ds, groups=cfg.dimension, use_bias=False
            )

    def _to_latent(self, audio: jnp.ndarray) -> jnp.ndarray:
        z = self.encoder(audio)
        z = self.enc_transformer(z)
        if self.cfg.downsample > 1:
            z = self.downsample_conv(z)
        return z

    def _from_latent(self, z: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.downsample > 1:
            z = self.upsample_conv(z)
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


# ---------------------------------------------------------------------------
# Checkpoint conversion (kyutai tokenizer-*.safetensors layout)
# ---------------------------------------------------------------------------


def convert_mimi(sd, cfg: MimiConfig) -> dict:
    """Real Mimi checkpoint -> Mimi flax variables.

    Layout (``moshi/models/loaders.py:26-79`` construction):
    ``encoder.model.{i}.conv.conv`` sequential SEANet (ELU slots unnumbered
    params), ``encoder_transformer.transformer.layers.{i}.*`` (fused
    in_proj, LayerScale, gating-none FFN), ``quantizer.rvq_{first,rest}``
    with 1x1 projections and EMA codebooks (``embedding_sum /
    cluster_usage``), learned conv resampling (``downsample.conv.conv`` /
    ``upsample.convtr.convtr``). Host-side numpy.
    """
    import numpy as np

    def cv(p):
        w = np.asarray(sd[p + ".weight"])  # [O, I, K]
        out = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
        if p + ".bias" in sd:
            out["bias"] = np.asarray(sd[p + ".bias"])
        return out

    def cvt(p, channel_wise=False):
        w = np.asarray(sd[p + ".weight"])  # [I, O/g, K]
        if channel_wise:  # groups == channels: [C, 1, K] -> [K, 1, C]
            k = w.transpose(2, 1, 0)[::-1]
        else:  # groups == 1: [I, O, K] -> [K, I, O]
            k = w.transpose(2, 0, 1)[::-1]
        out = {"kernel": np.ascontiguousarray(k)}
        if p + ".bias" in sd:
            out["bias"] = np.asarray(sd[p + ".bias"])
        return out

    def seanet_enc(prefix):
        n = len(cfg.ratios)
        out = {"conv_in": {"conv": cv(f"{prefix}.model.0.conv.conv")}}
        idx = 1
        for bi in range(n):
            for ri in range(cfg.n_residual_layers):
                bp = f"{prefix}.model.{idx}.block"
                out[f"block_{bi}_{ri}"] = {
                    "conv1": {"conv": cv(f"{bp}.1.conv.conv")},
                    "conv2": {"conv": cv(f"{bp}.3.conv.conv")},
                }
                idx += 1
            idx += 1  # ELU
            out[f"down_{bi}"] = {"conv": cv(f"{prefix}.model.{idx}.conv.conv")}
            idx += 1
        idx += 1  # ELU
        out["conv_out"] = {"conv": cv(f"{prefix}.model.{idx}.conv.conv")}
        return out

    def seanet_dec(prefix):
        n = len(cfg.ratios)
        out = {"conv_in": {"conv": cv(f"{prefix}.model.0.conv.conv")}}
        idx = 1
        for bi in range(n):
            idx += 1  # ELU
            out[f"up_{bi}"] = cvt(f"{prefix}.model.{idx}.convtr.convtr")
            idx += 1
            for ri in range(cfg.n_residual_layers):
                bp = f"{prefix}.model.{idx}.block"
                out[f"block_{bi}_{ri}"] = {
                    "conv1": {"conv": cv(f"{bp}.1.conv.conv")},
                    "conv2": {"conv": cv(f"{bp}.3.conv.conv")},
                }
                idx += 1
        idx += 1  # ELU
        out["conv_out"] = {"conv": cv(f"{prefix}.model.{idx}.conv.conv")}
        return out

    def transformer(prefix):
        out = {}
        for i in range(cfg.transformer_layers):
            p = f"{prefix}.transformer.layers.{i}"
            out[f"norm1_{i}"] = {"scale": np.asarray(sd[p + ".norm1.weight"]),
                                 "bias": np.asarray(sd[p + ".norm1.bias"])}
            out[f"norm2_{i}"] = {"scale": np.asarray(sd[p + ".norm2.weight"]),
                                 "bias": np.asarray(sd[p + ".norm2.bias"])}
            out[f"in_proj_{i}"] = {
                "kernel": np.ascontiguousarray(np.asarray(sd[p + ".self_attn.in_proj_weight"]).T)
            }
            out[f"out_proj_{i}"] = {
                "kernel": np.ascontiguousarray(np.asarray(sd[p + ".self_attn.out_proj.weight"]).T)
            }
            out[f"linear1_{i}"] = {
                "kernel": np.ascontiguousarray(np.asarray(sd[p + ".linear1.weight"]).T)
            }
            out[f"linear2_{i}"] = {
                "kernel": np.ascontiguousarray(np.asarray(sd[p + ".linear2.weight"]).T)
            }
            out[f"ls1_{i}"] = np.asarray(sd[p + ".layer_scale_1.scale"])
            out[f"ls2_{i}"] = np.asarray(sd[p + ".layer_scale_2.scale"])
        return out

    def rvq(prefix, n_q):
        def emb(q):
            base = f"{prefix}.vq.layers.{q}._codebook"
            if base + ".embedding_sum" in sd:
                s = np.asarray(sd[base + ".embedding_sum"])
                u = np.asarray(sd[base + ".cluster_usage"])
            else:  # older naming (core_vq.py:164-168 load hook)
                s = np.asarray(sd[base + ".embed_sum"])
                u = np.asarray(sd[base + ".cluster_size"])
            return s / np.maximum(u, 1e-5)[:, None]

        return {
            "input_proj": {"kernel": np.ascontiguousarray(
                np.asarray(sd[f"{prefix}.input_proj.weight"])[:, :, 0].T)},
            "output_proj": {"kernel": np.ascontiguousarray(
                np.asarray(sd[f"{prefix}.output_proj.weight"])[:, :, 0].T)},
            "codebooks": np.stack([emb(q) for q in range(n_q)]),
        }

    params = {
        "encoder": seanet_enc("encoder"),
        "decoder": seanet_dec("decoder"),
        "enc_transformer": transformer("encoder_transformer"),
        "dec_transformer": transformer("decoder_transformer"),
        "rvq_first": rvq("quantizer.rvq_first", cfg.n_q_semantic),
        "rvq_rest": rvq("quantizer.rvq_rest", cfg.n_q - cfg.n_q_semantic),
    }
    if cfg.downsample > 1:
        params["downsample_conv"] = {"conv": cv("downsample.conv.conv.conv")}
        params["upsample_conv"] = cvt("upsample.convtr.convtr.convtr", channel_wise=True)
    return {"params": params}
