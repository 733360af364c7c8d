"""Exact EnCodec and DAC audio codec ports (attack-bank backbones).

The reference's audio attack bank runs EnCodec and Descript-Audio-Codec
compression round trips loaded from pip packages
(``wmar_audio/training/augmentations.py:551-628``). These are
weight-compatible JAX re-implementations:

* **EnCodec** (facebookresearch/encodec, 24 kHz): causal SEANet with
  1x1-conv residual shortcuts, a 2-layer LSTM bottleneck, weight-normed
  convolutions (composed to plain kernels at conversion), and a residual VQ
  (``encodec/modules/seanet.py``, ``quantization/core_vq.py``).
* **DAC** (descript-audio-codec, 24 kHz): non-causal snake-activation
  SEANet (``dac/model/dac.py``, ``dac/nn/layers.py``) with per-codebook
  projected RVQ.

Both are pure-function forwards over converted param pytrees, jittable end
to end; construction without weights is refused by the attack wrapper like
the image codecs.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DN1 = ("NHC", "HIO", "NHC")


def _conv1d(p, x, stride=1, dilation=1, pad: Tuple[int, int] = (0, 0), groups=1):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride,), (pad,), rhs_dilation=(dilation,),
        dimension_numbers=DN1, feature_group_count=groups,
    )
    return y + p["bias"] if "bias" in p else y


def _convtr1d(p, x, stride):
    """torch ConvTranspose1d(k, stride) with VALID padding; kernel stored
    flipped/transposed at conversion so this is an lhs-dilated conv."""
    k = p["kernel"].shape[0]
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (1,), ((k - 1, k - 1),), lhs_dilation=(stride,),
        dimension_numbers=DN1,
    )
    return y + p["bias"] if "bias" in p else y


def _lstm(p: List[dict], x, skip: bool = False):
    """Multi-layer LSTM (torch gate order i,f,g,o) over [B, T, C].

    ``skip=True`` adds the module input to the output — the EnCodec /
    audiocraft ``SLSTM``/``StreamableLSTM`` residual (HF
    ``EncodecLSTM.forward`` ends with ``+ hidden_states``)."""
    x_in = x
    for layer in p:
        w_ih, w_hh = layer["w_ih"], layer["w_hh"]  # [in,4H], [H,4H]
        b = layer["b"]  # [4H]
        hdim = w_hh.shape[0]

        def step(carry, xt):
            h, c = carry
            gates = xt @ w_ih + h @ w_hh + b
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        b0 = x.shape[0]
        init = (jnp.zeros((b0, hdim), x.dtype), jnp.zeros((b0, hdim), x.dtype))
        _, ys = jax.lax.scan(step, init, x.transpose(1, 0, 2))
        x = ys.transpose(1, 0, 2)
    return x + x_in if skip else x


# ---------------------------------------------------------------------------
# EnCodec
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EncodecConfig:
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    ratios: Tuple[int, ...] = (8, 5, 4, 2)
    n_residual_layers: int = 1
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    lstm_layers: int = 2
    # The reference attack runs ``EncodecModel(tensor)`` at the default
    # bandwidth = target_bandwidths[0] = 1.5 kbps -> 2 quantizers
    # (reference wmar_audio/training/augmentations.py:599-624 + HF
    # modeling_encodec _encode_frame).
    n_q: int = 2
    bins: int = 1024
    pad_mode: str = "reflect"  # HF EncodecConfig.pad_mode for encodec_24khz

    @property
    def hop_length(self) -> int:
        h = 1
        for r in self.ratios:
            h *= r
        return h


ENCODEC_24K = EncodecConfig()


def _pad1d(x, left: int, right: int, mode: str = "zero"):
    """HF ``EncodecConv1d._pad1d``: reflect padding with the small-input
    guard (zero-extend right before reflecting when T <= max pad)."""
    if mode != "reflect":
        return jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    t = x.shape[1]
    extra = max(left, right) - t + 1 if t <= max(left, right) else 0
    if extra > 0:
        x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
    y = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
    return y[:, : y.shape[1] - extra] if extra > 0 else y


def _causal_conv(p, x, kernel, stride=1, dilation=1, pad_mode="reflect"):
    """Causal conv with the HF/encodec padding: full left pad (pad_mode,
    reflect for the published models) + right extra padding to complete the
    last frame (HF EncodecConv1d.forward)."""
    keff = (kernel - 1) * dilation + 1
    pad_total = keff - stride
    t = x.shape[1]
    n_frames = -(-(t - keff + pad_total) // stride)  # ceil((..)/s + 1) - 1
    extra = n_frames * stride + keff - pad_total - t
    x = _pad1d(x, max(pad_total, 0), max(extra, 0), mode=pad_mode)
    return _conv1d(p, x, stride=stride, dilation=dilation)


def _causal_convtr(p, x, stride):
    y = _convtr1d(p, x, stride)
    return y[:, : x.shape[1] * stride]


def _enc_resblock(p, x, cfg: EncodecConfig, dilation):
    h = jax.nn.elu(x)
    h = _causal_conv(p["conv1"], h, cfg.residual_kernel_size, dilation=dilation,
                     pad_mode=cfg.pad_mode)
    h = jax.nn.elu(h)
    h = _causal_conv(p["conv2"], h, 1, pad_mode=cfg.pad_mode)
    # EnCodec uses true_skip=False: 1x1 shortcut conv (seanet.py:60-73)
    return _causal_conv(p["shortcut"], x, 1, pad_mode=cfg.pad_mode) + h


def encodec_encode_latent(params, cfg: EncodecConfig, x):
    """x [B, T, 1] -> latents [B, frames, dimension]."""
    h = _causal_conv(params["conv_in"], x, cfg.kernel_size, pad_mode=cfg.pad_mode)
    for bi in range(len(cfg.ratios)):
        blk = params["down"][bi]
        for ri in range(cfg.n_residual_layers):
            h = _enc_resblock(blk["res"][ri], h, cfg, cfg.dilation_base**ri)
        h = jax.nn.elu(h)
        ratio = tuple(reversed(cfg.ratios))[bi]
        h = _causal_conv(blk["down"], h, 2 * ratio, stride=ratio, pad_mode=cfg.pad_mode)
    h = _lstm(params["lstm"], h, skip=True)
    h = jax.nn.elu(h)
    return _causal_conv(params["conv_out"], h, cfg.last_kernel_size, pad_mode=cfg.pad_mode)


def encodec_decode_latent(params, cfg: EncodecConfig, z):
    h = _causal_conv(params["conv_in"], z, cfg.kernel_size, pad_mode=cfg.pad_mode)
    h = _lstm(params["lstm"], h, skip=True)
    for bi, ratio in enumerate(cfg.ratios):
        blk = params["up"][bi]
        h = jax.nn.elu(h)
        h = _causal_convtr(blk["up"], h, ratio)
        for ri in range(cfg.n_residual_layers):
            h = _enc_resblock(blk["res"][ri], h, cfg, cfg.dilation_base**ri)
    h = jax.nn.elu(h)
    return _causal_conv(params["conv_out"], h, cfg.last_kernel_size, pad_mode=cfg.pad_mode)


def rvq_encode(codebooks: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Residual VQ: codebooks [n_q, bins, D], z [B, T, D] -> codes [B, n_q, T]."""
    def one(residual, cb):
        d = ((cb**2).sum(-1)[None, None, :]
             - 2.0 * jnp.einsum("btd,kd->btk", residual, cb))
        idx = jnp.argmin(d, axis=-1)
        return residual - cb[idx], idx

    codes = []
    residual = z
    for q in range(codebooks.shape[0]):
        residual, idx = one(residual, codebooks[q])
        codes.append(idx)
    return jnp.stack(codes, axis=1)


def rvq_decode(codebooks: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """codes [B, n_q, T] -> z_hat [B, T, D]."""
    out = 0.0
    for q in range(codebooks.shape[0]):
        out = out + codebooks[q][codes[:, q]]
    return out


def encodec_roundtrip(params, cfg: EncodecConfig, audio):
    z = encodec_encode_latent(params["encoder"], cfg, audio)
    codes = rvq_encode(params["codebooks"][: cfg.n_q], z)
    z_hat = rvq_decode(params["codebooks"][: cfg.n_q], codes)
    return encodec_decode_latent(params["decoder"], cfg, z_hat)


# ---------------------------------------------------------------------------
# DAC
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DACConfig:
    encoder_dim: int = 64
    encoder_rates: Tuple[int, ...] = (2, 4, 8, 8)
    decoder_dim: int = 1536
    decoder_rates: Tuple[int, ...] = (8, 8, 4, 2)
    latent_dim: int = 1024  # encoder_dim * 2**len(rates)
    n_codebooks: int = 32
    codebook_size: int = 1024
    codebook_dim: int = 8
    n_q: int = 8


DAC_24K = DACConfig()


def snake(p, x):
    """Snake1d: x + sin^2(alpha x)/alpha (dac/nn/layers.py). alpha [C]."""
    a = p["alpha"]
    return x + (jnp.sin(a * x) ** 2) / (a + 1e-9)


def _dac_resunit(p, x, dilation):
    """Snake, WNConv(k7, dilation, same pad), Snake, WNConv(k1)."""
    h = snake(p["snake1"], x)
    pad = (7 - 1) * dilation // 2
    h = _conv1d(p["conv1"], h, dilation=dilation, pad=(pad, pad))
    h = snake(p["snake2"], h)
    h = _conv1d(p["conv2"], h)
    return x + h


def dac_encode_latent(params, cfg: DACConfig, x):
    h = _conv1d(params["conv_in"], x, pad=(3, 3))
    for bi, stride in enumerate(cfg.encoder_rates):
        blk = params["blocks"][bi]
        for ri, dil in enumerate((1, 3, 9)):
            h = _dac_resunit(blk["res"][ri], h, dil)
        h = snake(blk["snake"], h)
        pad = (2 * stride - stride + 1) // 2  # ceil((2s - s)/2): torch pad
        h = _conv1d(blk["down"], h, stride=stride, pad=(pad, pad))
    h = snake(params["snake_out"], h)
    return _conv1d(params["conv_out"], h, pad=(1, 1))


def dac_decode_latent(params, cfg: DACConfig, z):
    h = _conv1d(params["conv_in"], z, pad=(3, 3))
    for bi, stride in enumerate(cfg.decoder_rates):
        blk = params["blocks"][bi]
        h = snake(blk["snake"], h)
        # WNConvTranspose1d(k=2s, stride=s, padding=ceil(s/2)): output pad
        # composed into the flipped-kernel conv at conversion
        k = blk["up"]["kernel"].shape[0]
        tp = -(-stride // 2)  # ceil(s/2) torch padding
        lo = k - 1 - tp
        y = jax.lax.conv_general_dilated(
            h, blk["up"]["kernel"], (1,), ((lo, lo),), lhs_dilation=(stride,),
            dimension_numbers=DN1,
        )
        h = y + blk["up"]["bias"]
        for ri, dil in enumerate((1, 3, 9)):
            h = _dac_resunit(blk["res"][ri], h, dil)
    h = snake(params["snake_out"], h)
    h = _conv1d(params["conv_out"], h, pad=(3, 3))
    return jnp.tanh(h)


def dac_roundtrip(params, cfg: DACConfig, audio):
    """Projected RVQ (dac/nn/quantize.py): per-codebook in/out 1x1 convs,
    L2-normalized codebook lookup."""
    z = dac_encode_latent(params["encoder"], cfg, audio)
    z_hat = 0.0
    residual = z
    for q in range(cfg.n_q):
        vq = params["quantizer"][q]
        zp = _conv1d(vq["in_proj"], residual)  # [B,T,cb_dim]
        zp_n = zp / jnp.maximum(jnp.linalg.norm(zp, axis=-1, keepdims=True), 1e-9)
        cb = vq["codebook"]
        cb_n = cb / jnp.maximum(jnp.linalg.norm(cb, axis=-1, keepdims=True), 1e-9)
        d = (cb_n**2).sum(-1)[None, None] - 2 * jnp.einsum("btd,kd->btk", zp_n, cb_n)
        idx = jnp.argmin(d, axis=-1)
        zq = _conv1d(vq["out_proj"], cb[idx])
        z_hat = z_hat + zq
        residual = residual - zq
    return dac_decode_latent(params["decoder"], cfg, z_hat)


# ---------------------------------------------------------------------------
# Conversion (weight-norm composition + torch layouts)
# ---------------------------------------------------------------------------


def _wn_conv(sd, p):
    """Compose weight_norm: w = g * v / ||v||_2 (norm over in,k per out ch);
    torch conv1d weight [O, I, K] -> [K, I, O]."""
    if p + ".weight_g" in sd:
        g = np.asarray(sd[p + ".weight_g"])  # [O,1,1]
        v = np.asarray(sd[p + ".weight_v"])
        w = g * v / np.maximum(
            np.linalg.norm(v.reshape(v.shape[0], -1), axis=1)[:, None, None], 1e-12
        )
    elif p + ".parametrizations.weight.original0" in sd:  # torch >= 2.1 layout
        g = np.asarray(sd[p + ".parametrizations.weight.original0"])
        v = np.asarray(sd[p + ".parametrizations.weight.original1"])
        w = g * v / np.maximum(
            np.linalg.norm(v.reshape(v.shape[0], -1), axis=1)[:, None, None], 1e-12
        )
    else:
        w = np.asarray(sd[p + ".weight"])
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
    if p + ".bias" in sd:
        out["bias"] = np.asarray(sd[p + ".bias"])
    return out


def _wn_convtr(sd, p):
    """ConvTranspose1d weight [I, O, K] -> flipped [K, I, O] for the
    lhs-dilated equivalent. weight_norm on transposed convs normalizes per
    *input* channel (dim 0 is in_channels)."""
    if p + ".weight_g" in sd:
        g = np.asarray(sd[p + ".weight_g"])
        v = np.asarray(sd[p + ".weight_v"])
        w = g * v / np.maximum(
            np.linalg.norm(v.reshape(v.shape[0], -1), axis=1)[:, None, None], 1e-12
        )
    elif p + ".parametrizations.weight.original0" in sd:
        g = np.asarray(sd[p + ".parametrizations.weight.original0"])
        v = np.asarray(sd[p + ".parametrizations.weight.original1"])
        w = g * v / np.maximum(
            np.linalg.norm(v.reshape(v.shape[0], -1), axis=1)[:, None, None], 1e-12
        )
    else:
        w = np.asarray(sd[p + ".weight"])
    w = w.transpose(2, 0, 1)[::-1]  # [K, I, O] flipped
    out = {"kernel": np.ascontiguousarray(w)}
    if p + ".bias" in sd:
        out["bias"] = np.asarray(sd[p + ".bias"])
    return out


def _lstm_params(sd, prefix, layers):
    out = []
    for k in range(layers):
        w_ih = np.asarray(sd[f"{prefix}.weight_ih_l{k}"]).T
        w_hh = np.asarray(sd[f"{prefix}.weight_hh_l{k}"]).T
        b = np.asarray(sd[f"{prefix}.bias_ih_l{k}"]) + np.asarray(sd[f"{prefix}.bias_hh_l{k}"])
        out.append({"w_ih": np.ascontiguousarray(w_ih),
                    "w_hh": np.ascontiguousarray(w_hh), "b": b})
    return out


def convert_encodec(sd, cfg: EncodecConfig = ENCODEC_24K) -> dict:
    """EnCodec state dict -> roundtrip params; accepts BOTH published
    layouts, auto-detected:

    * HF transformers (``facebook/encodec_24khz`` — what the reference's
      EncodecCompression actually loads): ``encoder.layers.{i}.conv`` /
      resblock ``block.{1,3}.conv`` / ``quantizer.layers.{q}.codebook.embed``
      (modeling_encodec.py EncodecEncoder/Decoder ModuleLists).
    * encodec package / audiocraft: ``encoder.model.{i}.conv.conv`` /
      ``convtr.convtr`` / ``quantizer.vq.layers.{q}._codebook.embed``.

    Sequential indexing (identical in both): encoder 0 = conv_in, per stage
    [resblocks, ELU, down-conv], then LSTM, ELU, conv_out; decoder mirrors
    with [ELU, up-convtr, resblocks] stages. ELUs consume index slots but
    hold no params. ``n_q`` selects the first codebooks (bandwidth tier).
    """
    hf = any(k.startswith(("encoder.layers.", "decoder.layers.")) for k in sd)
    seq = "layers" if hf else "model"
    conv_sfx = ".conv" if hf else ".conv.conv"
    convtr_sfx = ".conv" if hf else ".convtr.convtr"
    nlev = len(cfg.ratios)

    def res(prefix):
        return {
            "conv1": _wn_conv(sd, f"{prefix}.block.1{conv_sfx}"),
            "conv2": _wn_conv(sd, f"{prefix}.block.3{conv_sfx}"),
            "shortcut": _wn_conv(sd, f"{prefix}.shortcut{conv_sfx}"),
        }

    enc = {"conv_in": _wn_conv(sd, f"encoder.{seq}.0{conv_sfx}"), "down": []}
    idx = 1
    for _ in range(nlev):
        stage = {"res": []}
        for _ in range(cfg.n_residual_layers):
            stage["res"].append(res(f"encoder.{seq}.{idx}"))
            idx += 1
        idx += 1  # ELU
        stage["down"] = _wn_conv(sd, f"encoder.{seq}.{idx}{conv_sfx}")
        idx += 1
        enc["down"].append(stage)
    enc["lstm"] = _lstm_params(sd, f"encoder.{seq}.{idx}.lstm", cfg.lstm_layers)
    idx += 2  # LSTM + ELU
    enc["conv_out"] = _wn_conv(sd, f"encoder.{seq}.{idx}{conv_sfx}")

    dec = {"conv_in": _wn_conv(sd, f"decoder.{seq}.0{conv_sfx}")}
    dec["lstm"] = _lstm_params(sd, f"decoder.{seq}.1.lstm", cfg.lstm_layers)
    idx = 2
    dec["up"] = []
    for _ in range(nlev):
        idx += 1  # ELU
        stage = {"up": _wn_convtr(sd, f"decoder.{seq}.{idx}{convtr_sfx}")}
        idx += 1
        stage["res"] = []
        for _ in range(cfg.n_residual_layers):
            stage["res"].append(res(f"decoder.{seq}.{idx}"))
            idx += 1
        dec["up"].append(stage)
    idx += 1  # ELU
    dec["conv_out"] = _wn_conv(sd, f"decoder.{seq}.{idx}{conv_sfx}")

    cb_key = ("quantizer.layers.{q}.codebook.embed" if hf
              else "quantizer.vq.layers.{q}._codebook.embed")
    codebooks = np.stack([
        np.asarray(sd[cb_key.format(q=q)]) for q in range(cfg.n_q)
    ])
    return {"encoder": enc, "decoder": dec, "codebooks": codebooks}


def convert_dac(sd, cfg: DACConfig = DAC_24K) -> dict:
    """descript-audio-codec state dict -> roundtrip params
    (dac/model/dac.py Encoder/Decoder blocks + nn/quantize.py RVQ)."""

    def snk(p):
        return {"alpha": np.asarray(sd[p + ".alpha"]).reshape(1, 1, -1)}

    def resunit(p):
        return {
            "snake1": snk(p + ".block.0"),
            "conv1": _wn_conv(sd, p + ".block.1"),
            "snake2": snk(p + ".block.2"),
            "conv2": _wn_conv(sd, p + ".block.3"),
        }

    enc = {"conv_in": _wn_conv(sd, "encoder.block.0"), "blocks": []}
    for bi in range(len(cfg.encoder_rates)):
        p = f"encoder.block.{bi + 1}.block"
        enc["blocks"].append({
            "res": [resunit(f"{p}.{j}") for j in range(3)],
            "snake": snk(f"{p}.3"),
            "down": _wn_conv(sd, f"{p}.4"),
        })
    n_enc = len(cfg.encoder_rates) + 1
    enc["snake_out"] = snk(f"encoder.block.{n_enc}")
    enc["conv_out"] = _wn_conv(sd, f"encoder.block.{n_enc + 1}")

    dec = {"conv_in": _wn_conv(sd, "decoder.model.0"), "blocks": []}
    for bi in range(len(cfg.decoder_rates)):
        p = f"decoder.model.{bi + 1}.block"
        dec["blocks"].append({
            "snake": snk(f"{p}.0"),
            "up": _wn_convtr(sd, f"{p}.1"),
            "res": [resunit(f"{p}.{j}") for j in range(2, 5)],
        })
    n_dec = len(cfg.decoder_rates) + 1
    dec["snake_out"] = snk(f"decoder.model.{n_dec}")
    dec["conv_out"] = _wn_conv(sd, f"decoder.model.{n_dec + 1}")

    quant = []
    for q in range(cfg.n_q):
        p = f"quantizer.quantizers.{q}"
        quant.append({
            "in_proj": _wn_conv(sd, p + ".in_proj"),
            "out_proj": _wn_conv(sd, p + ".out_proj"),
            "codebook": np.asarray(sd[p + ".codebook.weight"]),
        })
    return {"encoder": enc, "decoder": dec, "quantizer": quant}


# ---------------------------------------------------------------------------
# Attack wrappers
# ---------------------------------------------------------------------------


class CodecCompression:
    """Audio codec round-trip attack (EncodecCompression/DacCompression
    counterparts). Requires converted weights — a random-weight codec is
    noise injection, not compression."""

    def __init__(self, kind: str, params, cfg=None):
        self.kind = kind
        if kind == "encodec":
            self.cfg = cfg or ENCODEC_24K
            fwd = lambda p, a: encodec_roundtrip(p, self.cfg, a)
        elif kind == "dac":
            self.cfg = cfg or DAC_24K
            fwd = lambda p, a: dac_roundtrip(p, self.cfg, a)
        else:
            raise ValueError(kind)
        self.params = jax.tree.map(jnp.asarray, params)
        self._fn = jax.jit(fwd)

    def __call__(self, audio, param=None, rng=None):
        hop = self.cfg.hop_length if self.kind == "encodec" else int(
            np.prod(self.cfg.encoder_rates)
        )
        t = audio.shape[1]
        t_pad = -(-t // hop) * hop
        x = jnp.pad(audio.astype(jnp.float32), ((0, 0), (0, t_pad - t), (0, 0)))
        out = self._fn(self.params, x)
        return out[:, :t]

    @staticmethod
    def from_checkpoint(kind: str, path: str, cfg=None):
        from wmar_tpu.utils.convert import load_torch_state_dict

        sd = load_torch_state_dict(path)
        if kind == "encodec":
            return CodecCompression(kind, convert_encodec(sd, cfg or ENCODEC_24K), cfg)
        return CodecCompression(kind, convert_dac(sd, cfg or DAC_24K), cfg)
