"""AudioSeal generator/detector — weight-compatible JAX port.

The reference's audio synchronization embeds a real per-sample watermark
through the ``audioseal`` package (reference ``wmar_audio/watermark/sync.py:
16,30-31`` loads ``audioseal_wm_16bits`` / ``audioseal_detector_16bits``;
``evals/eval_audioseal.py:96-98`` the robustness eval). This module ports
that model family TPU-first:

* **Generator** (``AudioSealWM``): SEANet encoder -> additive 16-bit message
  embedding -> SEANet decoder emitting a per-sample watermark delta
  (audioseal/models.py ``get_watermark``: crop to the input length).
* **Detector** (``AudioSealDetector``): ``SEANetEncoderKeepDimension`` (a
  SEANet encoder plus a hop-sized ConvTranspose1d back to sample rate)
  followed by a 1x1 conv to ``2 + nbits`` channels; softmax over the first
  two channels is the per-sample presence probability, the rest are message
  bit logits.

Unlike EnCodec (causal/reflect), AudioSeal's SEANet is built **non-causal
with zero padding** (audioseal card ``cards/audioseal_wm_16bits.yaml``:
``causal: false, pad_mode: constant``); the conv helpers here implement the
audiocraft asymmetric padding for that mode. Building blocks (weight-norm
composition, LSTM with skip, conv layouts) are shared with
:mod:`wmar_tpu.audio.codecs`.

Converters are shape-driven: the Sequential layout, filter counts, ratios
and nbits are reconstructed from the state dict, so the published
checkpoints convert without a hand-maintained geometry table.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wmar_tpu.audio.codecs import (
    _conv1d,
    _convtr1d,
    _lstm,
    _lstm_params,
    _wn_conv,
    _wn_convtr,
)


@dataclasses.dataclass(frozen=True)
class AudioSealConfig:
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
    nbits: int = 16
    detector_output_dim: int = 32
    sample_rate: int = 24000

    @property
    def hop_length(self) -> int:
        h = 1
        for r in self.ratios:
            h *= r
        return h


AUDIOSEAL_16B = AudioSealConfig()


# ---------------------------------------------------------------------------
# Non-causal audiocraft conv semantics (pad_mode constant)
# ---------------------------------------------------------------------------


def _nc_conv(p, x, kernel, stride=1, dilation=1):
    """audiocraft StreamableConv1d, causal=False: asymmetric zero padding
    (left = total - total//2, right = total//2 + extra-to-full-frame)."""
    keff = (kernel - 1) * dilation + 1
    pad_total = keff - stride
    t = x.shape[1]
    n_frames = -(-(t - keff + pad_total) // stride)
    extra = n_frames * stride + keff - pad_total - t
    right = pad_total // 2
    left = pad_total - right
    return _conv1d(p, x, stride=stride, dilation=dilation,
                   pad=(max(left, 0), max(right + extra, 0)))


def _nc_convtr(p, x, stride, kernel):
    """audiocraft StreamableConvTranspose1d, causal=False: trim
    ``total//2`` right and the rest left."""
    y = _convtr1d(p, x, stride)
    pad_total = kernel - stride
    right = pad_total // 2
    left = pad_total - right
    end = y.shape[1] - right
    return y[:, left:end]


def _resblock(p, x, cfg: AudioSealConfig, dilation):
    h = jax.nn.elu(x)
    h = _nc_conv(p["conv1"], h, cfg.residual_kernel_size, dilation=dilation)
    h = jax.nn.elu(h)
    h = _nc_conv(p["conv2"], h, 1)
    return _nc_conv(p["shortcut"], x, 1) + h


def _seanet_encode(params, cfg: AudioSealConfig, x):
    """x [B, T, C] -> latent [B, frames, dimension]."""
    h = _nc_conv(params["conv_in"], x, cfg.kernel_size)
    for bi in range(len(cfg.ratios)):
        blk = params["down"][bi]
        for ri in range(cfg.n_residual_layers):
            h = _resblock(blk["res"][ri], h, cfg, cfg.dilation_base**ri)
        h = jax.nn.elu(h)
        ratio = tuple(reversed(cfg.ratios))[bi]
        h = _nc_conv(blk["down"], h, 2 * ratio, stride=ratio)
    h = _lstm(params["lstm"], h, skip=True)
    h = jax.nn.elu(h)
    return _nc_conv(params["conv_out"], h, cfg.last_kernel_size)


def _seanet_decode(params, cfg: AudioSealConfig, z):
    h = _nc_conv(params["conv_in"], z, cfg.kernel_size)
    h = _lstm(params["lstm"], h, skip=True)
    for bi, ratio in enumerate(cfg.ratios):
        blk = params["up"][bi]
        h = jax.nn.elu(h)
        h = _nc_convtr(blk["up"], h, ratio, 2 * ratio)
        for ri in range(cfg.n_residual_layers):
            h = _resblock(blk["res"][ri], h, cfg, cfg.dilation_base**ri)
    h = jax.nn.elu(h)
    return _nc_conv(params["conv_out"], h, cfg.last_kernel_size)


# ---------------------------------------------------------------------------
# Generator / detector forward
# ---------------------------------------------------------------------------


def audioseal_get_watermark(params, cfg: AudioSealConfig, audio: jnp.ndarray,
                            message: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """audio [B, T, 1] -> watermark delta [B, T, 1].

    ``message`` is ``[B, nbits]`` in {0,1}; defaults to zeros (the reference
    sync path never sets one — audioseal samples a random message per call,
    which only matters for bit decoding, not presence detection).
    """
    t = audio.shape[1]
    hidden = _seanet_encode(params["encoder"], cfg, audio)
    if cfg.nbits:
        if message is None:
            message = jnp.zeros((audio.shape[0], cfg.nbits), jnp.int32)
        # MsgProcessor: Embedding(2*nbits, dim) rows 2k+bit_k, summed.
        idx = 2 * jnp.arange(cfg.nbits)[None, :] + message.astype(jnp.int32)
        msg_aux = params["msg_embed"][idx].sum(axis=1)  # [B, dim]
        hidden = hidden + msg_aux[:, None, :]
    delta = _seanet_decode(params["decoder"], cfg, hidden)
    return delta[:, :t]


def audioseal_detect(params, cfg: AudioSealConfig, audio: jnp.ndarray):
    """audio [B, T, 1] -> (presence [B, T], msg_logits [B, T, nbits]).

    ``SEANetEncoderKeepDimension`` + 1x1 conv head; presence is
    softmax(ch 0:2)[..., 1] (audioseal AudioSealDetector.forward).
    """
    t = audio.shape[1]
    h = _seanet_encode(params["encoder"], cfg, audio)
    h = _convtr1d(params["reverse_conv"], h, cfg.hop_length)[:, :t]
    logits = _conv1d(params["head"], h)
    probs = jax.nn.softmax(logits[..., :2], axis=-1)
    return probs[..., 1], logits[..., 2:]


def decode_message(msg_logits: jnp.ndarray) -> jnp.ndarray:
    """[B, T, nbits] -> hard bits [B, nbits] (mean over time > 0.5 after
    sigmoid, as in audioseal ``detect_watermark``)."""
    return (jax.nn.sigmoid(msg_logits).mean(axis=1) > 0.5).astype(jnp.int32)


class AudioSealModel:
    """Jitted wrapper satisfying :class:`wmar_tpu.audio.sync.SyncPattern`'s
    watermark-model interface (``get_watermark`` / ``detect``)."""

    def __init__(self, gen_params, det_params, cfg: AudioSealConfig = AUDIOSEAL_16B):
        self.cfg = cfg
        self.gen_params = jax.tree.map(jnp.asarray, gen_params)
        self.det_params = jax.tree.map(jnp.asarray, det_params)
        self._wm = jax.jit(lambda p, a, m: audioseal_get_watermark(p, cfg, a, m))
        self._det = jax.jit(lambda p, a: audioseal_detect(p, cfg, a))

    def get_watermark(self, audio: jnp.ndarray, message=None) -> jnp.ndarray:
        if message is None:
            message = jnp.zeros((audio.shape[0], self.cfg.nbits), jnp.int32)
        return self._wm(self.gen_params, audio, message)

    def detect(self, audio: jnp.ndarray) -> jnp.ndarray:
        presence, _ = self._det(self.det_params, audio)
        return presence

    def detect_full(self, audio: jnp.ndarray):
        return self._det(self.det_params, audio)

    @staticmethod
    def from_checkpoints(gen_path: str, det_path: str) -> "AudioSealModel":
        from wmar_tpu.utils.convert import load_torch_state_dict

        gen_sd = load_torch_state_dict(gen_path)
        det_sd = load_torch_state_dict(det_path)
        gp, cfg = convert_audioseal_generator(gen_sd)
        dp, dcfg = convert_audioseal_detector(det_sd)
        cfg = dataclasses.replace(
            cfg, detector_output_dim=dcfg.detector_output_dim, nbits=dcfg.nbits)
        return AudioSealModel(gp, dp, cfg)


# ---------------------------------------------------------------------------
# Shape-driven converters (audioseal package layout)
# ---------------------------------------------------------------------------


def _first_key(sd, *cands):
    for c in cands:
        for suffix in (".weight", ".weight_g", ".parametrizations.weight.original0"):
            if c + suffix in sd:
                return c
    raise KeyError(f"none of {cands} in state dict")


def _conv_shape(sd, prefix):
    """(out, in, k) of a (possibly weight-normed) torch conv at prefix."""
    for suffix in (".weight", ".weight_v", ".parametrizations.weight.original1"):
        if prefix + suffix in sd:
            return tuple(np.asarray(sd[prefix + suffix]).shape)
    raise KeyError(prefix)


def _walk_seanet(sd, prefix) -> Dict[str, object]:
    """Classify the Sequential slots under ``{prefix}.{i}`` (audiocraft
    naming: convs at ``.conv.conv``, transposed at ``.convtr.convtr``,
    resblock convs at ``.block.{1,3}.conv.conv``, LSTM at ``.lstm``)."""
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.")
    idxs = sorted({int(m.group(1)) for k in sd if (m := pat.match(k))})
    slots = []
    for i in idxs:
        base = f"{prefix}.{i}"
        if f"{base}.lstm.weight_ih_l0" in sd:
            n_layers = len({k for k in sd if k.startswith(f"{base}.lstm.weight_ih_l")})
            slots.append((i, "lstm", n_layers))
        elif any(k.startswith(f"{base}.block.") for k in sd):
            slots.append((i, "res", None))
        elif any(k.startswith(f"{base}.convtr.") for k in sd):
            slots.append((i, "convtr", _conv_shape(sd, f"{base}.convtr.convtr")))
        else:
            slots.append((i, "conv", _conv_shape(sd, f"{base}.conv.conv")))
    return slots


def _res_params(sd, prefix):
    return {
        "conv1": _wn_conv(sd, prefix + ".block.1.conv.conv"),
        "conv2": _wn_conv(sd, prefix + ".block.3.conv.conv"),
        "shortcut": _wn_conv(sd, prefix + ".shortcut.conv.conv"),
    }


def _convert_seanet_encoder(sd, prefix):
    """-> (params, dict of inferred geometry)."""
    slots = _walk_seanet(sd, prefix)
    kinds = [s[1] for s in slots]
    conv_slots = [s for s in slots if s[1] == "conv"]
    first_i, _, (n_filters, channels, kernel_size) = conv_slots[0]
    last_i, _, (dimension, _, last_kernel) = conv_slots[-1]
    lstm_i, _, lstm_layers = next(s for s in slots if s[1] == "lstm")

    params = {"conv_in": _wn_conv(sd, f"{prefix}.{first_i}.conv.conv"), "down": []}
    ratios_rev, stage = [], {"res": []}
    for i, kind, shape in slots[1:]:
        if kind == "res":
            stage["res"].append(_res_params(sd, f"{prefix}.{i}"))
        elif kind == "conv" and i != last_i:
            stage["down"] = _wn_conv(sd, f"{prefix}.{i}.conv.conv")
            ratios_rev.append(shape[2] // 2)  # kernel = 2 * ratio
            params["down"].append(stage)
            stage = {"res": []}
        elif kind == "lstm":
            params["lstm"] = _lstm_params(sd, f"{prefix}.{i}.lstm", lstm_layers)
    params["conv_out"] = _wn_conv(sd, f"{prefix}.{last_i}.conv.conv")
    n_res = max(1, len(params["down"][0]["res"])) if params["down"] else 1
    geom = dict(
        channels=channels, n_filters=n_filters, kernel_size=kernel_size,
        last_kernel_size=last_kernel, dimension=dimension,
        ratios=tuple(reversed(ratios_rev)), lstm_layers=lstm_layers,
        n_residual_layers=len(params["down"][0]["res"]) if params["down"] else n_res,
    )
    del kinds
    return params, geom


def _convert_seanet_decoder(sd, prefix):
    slots = _walk_seanet(sd, prefix)
    conv_slots = [s for s in slots if s[1] == "conv"]
    first_i, _, (_, dimension, kernel_size) = conv_slots[0]
    last_i, _, (channels, n_filters, last_kernel) = conv_slots[-1]
    lstm_i, _, lstm_layers = next(s for s in slots if s[1] == "lstm")

    params = {"conv_in": _wn_conv(sd, f"{prefix}.{first_i}.conv.conv"),
              "lstm": _lstm_params(sd, f"{prefix}.{lstm_i}.lstm", lstm_layers)}
    ratios, up = [], []
    stage = None
    for i, kind, shape in slots:
        if kind == "convtr":
            if stage is not None:
                up.append(stage)
            stage = {"up": _wn_convtr(sd, f"{prefix}.{i}.convtr.convtr"),
                     "res": []}
            ratios.append(shape[2] // 2)
        elif kind == "res":
            stage["res"].append(_res_params(sd, f"{prefix}.{i}"))
    if stage is not None:
        up.append(stage)
    params["up"] = up
    params["conv_out"] = _wn_conv(sd, f"{prefix}.{last_i}.conv.conv")
    geom = dict(channels=channels, n_filters=n_filters, kernel_size=kernel_size,
                last_kernel_size=last_kernel, dimension=dimension,
                ratios=tuple(ratios), lstm_layers=lstm_layers,
                n_residual_layers=len(up[0]["res"]) if up else 1)
    return params, geom


def convert_audioseal_generator(sd) -> Tuple[dict, AudioSealConfig]:
    """``audioseal_wm_16bits`` checkpoint -> (params, inferred config).

    Layout (audioseal/models.py AudioSealWM): ``encoder.model.*`` /
    ``decoder.model.*`` SEANets + ``msg_processor.msg_processor.weight``
    (Embedding [2*nbits, dimension])."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    enc, eg = _convert_seanet_encoder(sd, "encoder.model")
    dec, dg = _convert_seanet_decoder(sd, "decoder.model")
    params = {"encoder": enc, "decoder": dec}
    nbits = 0
    for k in ("msg_processor.msg_processor.weight", "msg_processor.weight"):
        if k in sd:
            emb = np.asarray(sd[k])
            params["msg_embed"] = emb
            nbits = emb.shape[0] // 2
            break
    cfg = AudioSealConfig(
        channels=eg["channels"], dimension=eg["dimension"],
        n_filters=eg["n_filters"], ratios=eg["ratios"],
        n_residual_layers=eg["n_residual_layers"],
        kernel_size=eg["kernel_size"], last_kernel_size=eg["last_kernel_size"],
        lstm_layers=eg["lstm_layers"], nbits=nbits,
    )
    assert dg["ratios"] == eg["ratios"], (dg, eg)
    return params, cfg


def convert_audioseal_detector(sd) -> Tuple[dict, AudioSealConfig]:
    """``audioseal_detector_16bits`` checkpoint -> (params, inferred config).

    Layout (audioseal/models.py AudioSealDetector): ``detector.0`` =
    SEANetEncoderKeepDimension (``model.*`` + ``reverse_convolution``, a
    plain ConvTranspose1d with kernel = stride = hop), ``detector.1`` =
    Conv1d(output_dim, 2 + nbits, 1)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    enc, eg = _convert_seanet_encoder(sd, "detector.0.model")
    params = {
        "encoder": enc,
        "reverse_conv": _wn_convtr(sd, "detector.0.reverse_convolution"),
        "head": _wn_conv(sd, "detector.1"),
    }
    head_out = _conv_shape(sd, "detector.1")[0]
    rev_out = _conv_shape(sd, "detector.0.reverse_convolution")[1]
    cfg = AudioSealConfig(
        channels=eg["channels"], dimension=eg["dimension"],
        n_filters=eg["n_filters"], ratios=eg["ratios"],
        n_residual_layers=eg["n_residual_layers"],
        kernel_size=eg["kernel_size"], last_kernel_size=eg["last_kernel_size"],
        lstm_layers=eg["lstm_layers"], nbits=head_out - 2,
        detector_output_dim=rev_out,
    )
    return params, cfg


# ---------------------------------------------------------------------------
# Synthetic state dicts (random init / full-geometry converter validation)
# ---------------------------------------------------------------------------


def synthetic_generator_sd(cfg: AudioSealConfig = AUDIOSEAL_16B, seed: int = 0,
                           scale: float = 0.1) -> Dict[str, np.ndarray]:
    """Random torch-layout state dict at the given geometry (the published
    checkpoints cannot be fetched in a zero-egress environment; this feeds
    the converters the exact shapes they will see)."""
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}

    def conv(prefix, i, o, k):
        sd[prefix + ".weight"] = rng.normal(0, scale, (o, i, k)).astype(np.float32)
        sd[prefix + ".bias"] = rng.normal(0, scale, (o,)).astype(np.float32)

    def convtr(prefix, i, o, k):
        sd[prefix + ".weight"] = rng.normal(0, scale, (i, o, k)).astype(np.float32)
        sd[prefix + ".bias"] = rng.normal(0, scale, (o,)).astype(np.float32)

    def lstm(prefix, dim, layers):
        for l in range(layers):
            sd[f"{prefix}.weight_ih_l{l}"] = rng.normal(0, scale, (4 * dim, dim)).astype(np.float32)
            sd[f"{prefix}.weight_hh_l{l}"] = rng.normal(0, scale, (4 * dim, dim)).astype(np.float32)
            sd[f"{prefix}.bias_ih_l{l}"] = rng.normal(0, scale, (4 * dim,)).astype(np.float32)
            sd[f"{prefix}.bias_hh_l{l}"] = rng.normal(0, scale, (4 * dim,)).astype(np.float32)

    def res(prefix, dim, k):
        conv(f"{prefix}.block.1.conv.conv", dim, dim // 2, k)
        conv(f"{prefix}.block.3.conv.conv", dim // 2, dim, 1)
        conv(f"{prefix}.shortcut.conv.conv", dim, dim, 1)

    def encoder(prefix):
        f, idx = cfg.n_filters, 0
        conv(f"{prefix}.{idx}.conv.conv", cfg.channels, f, cfg.kernel_size)
        idx += 1
        mult = 1
        for ratio in reversed(cfg.ratios):
            for _ in range(cfg.n_residual_layers):
                res(f"{prefix}.{idx}", mult * f, cfg.residual_kernel_size)
                idx += 1
            idx += 1  # ELU
            conv(f"{prefix}.{idx}.conv.conv", mult * f, mult * f * 2, 2 * ratio)
            idx += 1
            mult *= 2
        lstm(f"{prefix}.{idx}.lstm", mult * f, cfg.lstm_layers)
        idx += 2  # LSTM + ELU
        conv(f"{prefix}.{idx}.conv.conv", mult * f, cfg.dimension, cfg.last_kernel_size)
        return mult

    mult = encoder("encoder.model")
    # decoder
    f, idx = cfg.n_filters, 0
    conv(f"decoder.model.{idx}.conv.conv", cfg.dimension, mult * f, cfg.kernel_size)
    idx += 1
    lstm(f"decoder.model.{idx}.lstm", mult * f, cfg.lstm_layers)
    idx += 1
    for ratio in cfg.ratios:
        idx += 1  # ELU
        convtr(f"decoder.model.{idx}.convtr.convtr", mult * f, mult * f // 2, 2 * ratio)
        idx += 1
        for _ in range(cfg.n_residual_layers):
            res(f"decoder.model.{idx}", mult * f // 2, cfg.residual_kernel_size)
            idx += 1
        mult //= 2
    idx += 1  # ELU
    conv(f"decoder.model.{idx}.conv.conv", f, cfg.channels, cfg.last_kernel_size)
    sd["msg_processor.msg_processor.weight"] = rng.normal(
        0, scale, (2 * cfg.nbits, cfg.dimension)).astype(np.float32)
    return sd


def synthetic_detector_sd(cfg: AudioSealConfig = AUDIOSEAL_16B, seed: int = 1,
                          scale: float = 0.1) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    gen = synthetic_generator_sd(cfg, seed, scale)
    sd = {("detector.0.model" + k[len("encoder.model"):]): v
          for k, v in gen.items() if k.startswith("encoder.model")}
    hop = cfg.hop_length
    sd["detector.0.reverse_convolution.weight"] = rng.normal(
        0, scale, (cfg.dimension, cfg.detector_output_dim, hop)).astype(np.float32)
    sd["detector.0.reverse_convolution.bias"] = rng.normal(
        0, scale, (cfg.detector_output_dim,)).astype(np.float32)
    sd["detector.1.weight"] = rng.normal(
        0, scale, (2 + cfg.nbits, cfg.detector_output_dim, 1)).astype(np.float32)
    sd["detector.1.bias"] = rng.normal(0, scale, (2 + cfg.nbits,)).astype(np.float32)
    return sd
