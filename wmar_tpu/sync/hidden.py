"""HiDDeN baseline watermarker (weight-compatible JAX port).

The reference ships ``hidden`` as two third-party TorchScript blobs
(``checkpoints/hidden_{encoder,decoder}_48b.pt``) wrapped by
``BaselineHiddenEmbedder``/``BaselineHiddenExtractor``
(``syncseal/syncseal/evals/baselines.py:16-76``): ImageNet-normalized
inputs, messages in {-1,+1}, encoder output de-normalized by the channel
stds, detector output prepended with a zero column.

The underlying architecture is public (HiDDeN, Zhu et al. 2018, as released
in facebookresearch/stable_signature ``hidden/models.py``): Conv-BN-GELU
stacks; the encoder tiles the message over the spatial grid, concatenates
``[msgs, features, image]`` and maps back to 3 channels (optionally tanh);
the decoder pools a deeper stack to ``num_bits`` and applies one linear
layer. This module re-implements it functionally (NHWC) with a converter
that reads the weights straight out of the TorchScript archive
(``torch.jit.load(...).state_dict()`` — the graph is opaque, the tensors
are not). If the blob's layout ever differs from the public architecture
the converter fails loudly on its key set rather than producing noise.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class HiddenConfig:
    num_bits: int = 48
    channels: int = 64
    enc_blocks: int = 4   # conv_bns depth (stable_signature default)
    dec_blocks: int = 8   # decoder stack depth
    redundancy: int = 1
    last_tanh: bool = True
    activation: str = "gelu"  # stable_signature uses GELU in ConvBNRelu


def _act(cfg: HiddenConfig, x):
    import jax

    return jax.nn.gelu(x, approximate=False) if cfg.activation == "gelu" else jax.nn.relu(x)


def _conv_bn(p: dict, cfg: HiddenConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Conv3x3(pad 1) -> BatchNorm (inference, running stats) -> act."""
    import jax

    y = jax.lax.conv_general_dilated(
        x, p["conv"]["kernel"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["conv"]["bias"]
    bn = p["bn"]
    y = (y - bn["mean"]) / jnp.sqrt(bn["var"] + 1e-5) * bn["gamma"] + bn["beta"]
    return _act(cfg, y)


def hidden_encoder_forward(params: dict, cfg: HiddenConfig,
                           imgs_norm: jnp.ndarray, msgs_pm1: jnp.ndarray) -> jnp.ndarray:
    """ImageNet-normalized NHWC images + {-1,+1} messages -> watermarked
    (still normalized) images. Mirrors ``HiddenEncoder.forward``."""
    import jax

    h = imgs_norm
    for blk in params["conv_bns"]:
        h = _conv_bn(blk, cfg, h)
    b, hh, ww, _ = h.shape
    msgs = jnp.broadcast_to(
        msgs_pm1.astype(h.dtype)[:, None, None, :], (b, hh, ww, msgs_pm1.shape[-1]))
    concat = jnp.concatenate([msgs, h, imgs_norm], axis=-1)
    h = _conv_bn(params["after_concat"], cfg, concat)
    out = jax.lax.conv_general_dilated(
        h, params["final"]["kernel"], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["final"]["bias"]
    return jnp.tanh(out) if cfg.last_tanh else out


def hidden_decoder_forward(params: dict, cfg: HiddenConfig,
                           imgs_norm: jnp.ndarray) -> jnp.ndarray:
    """Normalized NHWC images -> ``[B, num_bits]`` soft bits."""
    h = imgs_norm
    for blk in params["layers"]:
        h = _conv_bn(blk, cfg, h)
    h = h.mean(axis=(1, 2))  # AdaptiveAvgPool2d(1)
    out = h @ params["linear"]["w"] + params["linear"]["b"]
    if cfg.redundancy > 1:
        out = out.reshape(out.shape[0], cfg.num_bits, cfg.redundancy).sum(-1)
    return out


# ---------------------------------------------------------------------------
# Converters (shape-driven, from the TorchScript archives' state dicts)
# ---------------------------------------------------------------------------


def _np(t):
    return np.asarray(getattr(t, "detach", lambda: t)().numpy()
                      if hasattr(t, "detach") else t, np.float32)


def _conv_bn_from_sd(sd, prefix: str) -> dict:
    return {
        "conv": {
            "kernel": np.ascontiguousarray(
                np.transpose(_np(sd[prefix + "layers.0.weight"]), (2, 3, 1, 0))),
            "bias": _np(sd[prefix + "layers.0.bias"]),
        },
        "bn": {
            "gamma": _np(sd[prefix + "layers.1.weight"]),
            "beta": _np(sd[prefix + "layers.1.bias"]),
            "mean": _np(sd[prefix + "layers.1.running_mean"]),
            "var": _np(sd[prefix + "layers.1.running_var"]),
        },
    }


def _count(sd, fmt: str) -> int:
    n = 0
    while fmt.format(n) in sd:
        n += 1
    return n


def convert_hidden_encoder(sd) -> tuple:
    """Encoder state dict -> (params, HiddenConfig). Shapes determine
    channels / blocks / num_bits; unknown layouts raise KeyError."""
    n = _count(sd, "conv_bns.{}.layers.0.weight")
    if n == 0:
        raise KeyError(
            "hidden encoder: no conv_bns.*.layers.0.weight keys — the blob "
            "does not follow the public stable_signature HiddenEncoder layout")
    blocks = [_conv_bn_from_sd(sd, f"conv_bns.{i}.") for i in range(n)]
    channels = blocks[0]["conv"]["kernel"].shape[-1]
    after = _conv_bn_from_sd(sd, "after_concat_layer.")
    concat_in = after["conv"]["kernel"].shape[2]
    num_bits = concat_in - channels - 3
    fin_w = _np(sd["final_layer.weight"])
    cfg = HiddenConfig(num_bits=num_bits, channels=channels, enc_blocks=n)
    params = {
        "conv_bns": blocks,
        "after_concat": after,
        "final": {
            "kernel": np.ascontiguousarray(np.transpose(fin_w, (2, 3, 1, 0))),
            "bias": _np(sd["final_layer.bias"]),
        },
    }
    return params, cfg


def convert_hidden_decoder(sd) -> tuple:
    n = _count(sd, "layers.{}.layers.0.weight")
    if n == 0:
        raise KeyError(
            "hidden decoder: no layers.*.layers.0.weight keys — the blob "
            "does not follow the public stable_signature HiddenDecoder layout")
    blocks = [_conv_bn_from_sd(sd, f"layers.{i}.") for i in range(n)]
    lin_w = _np(sd["linear.weight"])
    params = {
        "layers": blocks,
        "linear": {"w": np.ascontiguousarray(lin_w.T), "b": _np(sd["linear.bias"])},
    }
    # linear is (num_bits*redundancy -> num_bits*redundancy); the released
    # 48b model uses redundancy=1, so num_bits == linear out dim.
    cfg = HiddenConfig(num_bits=int(lin_w.shape[0]),
                       channels=int(blocks[0]["conv"]["kernel"].shape[-1]),
                       dec_blocks=n, redundancy=1)
    return params, cfg


def load_hidden_torchscript(encoder_path: str, decoder_path: str):
    """``torch.jit.load`` both blobs and convert their state dicts."""
    import torch

    enc_sd = {k: v for k, v in torch.jit.load(encoder_path, map_location="cpu")
              .state_dict().items()}
    dec_sd = {k: v for k, v in torch.jit.load(decoder_path, map_location="cpu")
              .state_dict().items()}
    enc_params, enc_cfg = convert_hidden_encoder(enc_sd)
    dec_params, dec_cfg = convert_hidden_decoder(dec_sd)
    return enc_params, dec_params, enc_cfg, dec_cfg


def init_hidden_params(seed: int, cfg: HiddenConfig) -> tuple:
    """Random params in converter shapes (tests / smoke)."""
    rng = np.random.default_rng(seed)

    def conv_bn(cin, cout, k=3):
        return {
            "conv": {"kernel": rng.normal(0, (2.0 / (cin * k * k)) ** 0.5,
                                          (k, k, cin, cout)).astype(np.float32),
                     "bias": np.zeros((cout,), np.float32)},
            "bn": {"gamma": np.ones((cout,), np.float32),
                   "beta": np.zeros((cout,), np.float32),
                   "mean": np.zeros((cout,), np.float32),
                   "var": np.ones((cout,), np.float32)},
        }

    c, k = cfg.channels, cfg.num_bits
    enc = {
        "conv_bns": [conv_bn(3 if i == 0 else c, c) for i in range(cfg.enc_blocks)],
        "after_concat": conv_bn(c + 3 + k, c),
        "final": {"kernel": rng.normal(0, (2.0 / c) ** 0.5, (1, 1, c, 3)).astype(np.float32),
                  "bias": np.zeros((3,), np.float32)},
    }
    kr = k * cfg.redundancy
    dec_blocks: List[dict] = [conv_bn(3 if i == 0 else c, c)
                              for i in range(cfg.dec_blocks - 1)]
    dec_blocks.append(conv_bn(c, kr))
    dec = {
        "layers": dec_blocks,
        "linear": {"w": rng.normal(0, kr**-0.5, (kr, kr)).astype(np.float32),
                   "b": np.zeros((kr,), np.float32)},
    }
    return enc, dec


def normalize(imgs01: jnp.ndarray) -> jnp.ndarray:
    return (imgs01 - IMAGENET_MEAN) / IMAGENET_STD


def denormalize_signal(x: jnp.ndarray) -> jnp.ndarray:
    """The reference's postprocess ``Normalize(mean=0, std=1/std)``: multiply
    by the channel stds only (``baselines.py:27,48``)."""
    return x * IMAGENET_STD
