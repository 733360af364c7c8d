"""Exact SyncSeal backbones, weight-compatible with the released checkpoint.

The reference's shipped configuration (``syncseal/configs/embedder.yaml``:
``unet_small2_yuv`` family, ``extractor.yaml``: ``convnext_tiny``) is:

* **UNet embedder** on the Y (luma) channel — ResnetBlock(conv-GN-GELU ×2 +
  1x1 res), 3 strided DBlocks (16→32→64→128), 8 bottleneck blocks, UBlocks
  with bilinear Upsample(+reflect-pad conv + channels-first LN + GELU) and
  2^-0.5-scaled skip concats, 1x1 head with tanh
  [``syncseal/modules/unet.py:140-236``, ``modules/common.py:13-110``].
* **ConvNeXtV2 extractor** (depths 3/3/9/3, dims 96/192/384/768, GRN blocks)
  + ``Head``: spatial mean-pool then Linear to 1+8 (detection logit + the 8
  corner coordinates normalized to [-1, 1])
  [``syncseal/modules/convnext.py``, ``modules/head.py``].
* **NLayerDiscriminator** (PatchGAN, GroupNorm(4), ndf 32) for the hinge-GAN
  term of ``losses/sync_loss.py:43-172``.

All pure-function JAX with converters from the torch state dicts; the SAM
ViT extractor variant reuses ``wam_exact.sam_encoder``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DN = ("NHWC", "HWIO", "NHWC")

RGB2YUV_M = np.array(
    [[0.299, 0.587, 0.114],
     [-0.14713, -0.28886, 0.436],
     [0.615, -0.51499, -0.10001]], np.float32
)
YUV2RGB_M = np.array(
    [[1.0, 0.0, 1.13983],
     [1.0, -0.39465, -0.58060],
     [1.0, 2.03211, 0.0]], np.float32
)


def rgb_to_yuv(x):
    return x @ jnp.asarray(RGB2YUV_M).T


def _conv(p, x, stride=1, pad=None, groups=1):
    k = p["kernel"].shape[0]
    pad = k // 2 if pad is None else pad
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=DN, feature_group_count=groups,
    )
    return y + p["bias"] if "bias" in p else y


def _gn(p, x, groups):
    b, h, w, c = x.shape
    xg = x.reshape(b, h, w, groups, c // groups)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + 1e-5)
    return xg.reshape(b, h, w, c) * p["scale"] + p["bias"]


def _ln(p, x, eps=1e-6):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


# ---------------------------------------------------------------------------
# UNet embedder (unet_small2 family)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 1
    out_channels: int = 1
    z_channels: int = 16
    num_blocks: int = 8
    z_channels_mults: Tuple[int, ...] = (1, 2, 4, 8)
    norm_groups: int = 8  # get_normalization("group") -> GroupNorm(8, c)
    last_tanh: bool = True
    # The quantizable training variant (configs/embedder.yaml
    # unet_small2_yuv_quantizable) swaps gelu->relu and group->batch norm;
    # batch norm here is train-mode batch statistics (scale/bias params only).
    activation: str = "gelu"
    normalization: str = "group"


UNET_SMALL2_YUV = UNetConfig()
UNET_SMALL2_YUV_QUANTIZABLE = UNetConfig(activation="relu", normalization="batch")


def _bn(p, x):
    """Train-mode batch norm: per-channel stats over (B, H, W)."""
    mean = x.mean(axis=(0, 1, 2), keepdims=True)
    var = x.var(axis=(0, 1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]


def _res_block(p, x, groups, act=None, norm=None):
    """conv3(no bias) norm act conv3(no bias) norm act + 1x1 res conv.
    Defaults to the shipped GN+GELU; the quantizable variant passes
    relu/_bn."""
    act = act or (lambda v: jax.nn.gelu(v, approximate=False))
    norm = norm or (lambda q, v: _gn(q, v, groups))
    h = act(norm(p["norm1"], _conv(p["conv1"], x)))
    h = act(norm(p["norm2"], _conv(p["conv2"], h)))
    return h + _conv(p["res"], x, pad=0)


def _ublock_up(p, x):
    """bilinear x2 + reflect-pad conv3(no bias) + channels-first LN + GELU."""
    from wmar_tpu.sync.wam_exact import torch_bilinear_up

    x = torch_bilinear_up(x, 2)
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(x, p["conv"]["kernel"], (1, 1), "VALID",
                                     dimension_numbers=DN)
    return jax.nn.gelu(_ln(p["ln"], x), approximate=False)


def unet_forward(params: dict, cfg: UNetConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x: [B,H,W,in] in [-1,1] (the embedder preprocesses) -> delta [B,H,W,out]."""
    g = cfg.norm_groups
    act = (jax.nn.relu if cfg.activation == "relu"
           else (lambda v: jax.nn.gelu(v, approximate=False)))
    norm = _bn if cfg.normalization == "batch" else (lambda q, v: _gn(q, v, g))
    h = _res_block(params["inc"], x, g, act, norm)
    hiddens = [h]
    for d in params["downs"]:
        h = _conv(d["down"], hiddens[-1], stride=2)
        h = _res_block(d["conv"], h, g, act, norm)
        hiddens.append(h)
    x_ = hiddens[-1]
    for blk in params["bottleneck"]:
        x_ = _res_block(blk, x_, g, act, norm)
    scale = 2.0**-0.5
    for u in params["ups"]:
        skip = hiddens.pop()
        x_ = jnp.concatenate([x_, skip * scale], axis=-1)
        x_ = _ublock_up(u["up"], x_)
        x_ = _res_block(u["conv"], x_, g, act, norm)
    out = _conv(params["outc"], x_, pad=0)
    return jnp.tanh(out) if cfg.last_tanh else out


# ---------------------------------------------------------------------------
# ConvNeXtV2 extractor + Head
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    out_dim: int = 8  # corner coords; head outputs 1 + out_dim


CONVNEXT_TINY = ConvNeXtConfig()


def _grn(p, x):
    """Global response normalization over (H, W) per channel (common.py GRN)."""
    gx = jnp.sqrt((x**2).sum(axis=(1, 2), keepdims=True))
    nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
    return p["gamma"] * (x * nx) + p["beta"] + x


def _convnext_block(p, x):
    dim = x.shape[-1]
    h = _conv(p["dwconv"], x, groups=dim)
    h = _ln(p["norm"], h)
    h = h @ p["pwconv1"]["w"] + p["pwconv1"]["b"]
    h = jax.nn.gelu(h, approximate=False)
    h = _grn(p["grn"], h)
    h = h @ p["pwconv2"]["w"] + p["pwconv2"]["b"]
    return x + h


def convnext_forward(params: dict, cfg: ConvNeXtConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x [-1,1] NHWC -> preds [B, 1+out_dim] (detect logit + corner coords)."""
    for i in range(len(cfg.depths)):
        ds = params["downsample"][i]
        if i == 0:
            x = _conv(ds["conv"], x, stride=4, pad=0)
            x = _ln(ds["norm"], x)
        else:
            x = _ln(ds["norm"], x)
            x = _conv(ds["conv"], x, stride=2, pad=0)
        for blk in params["stages"][i]:
            x = _convnext_block(blk, x)
    pooled = x.mean(axis=(1, 2))
    return pooled @ params["head"]["w"] + params["head"]["b"]


# ---------------------------------------------------------------------------
# NLayerDiscriminator (PatchGAN with GroupNorm(4))
# ---------------------------------------------------------------------------


def discriminator_forward(params: List[dict], x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] -> patch logits. Layout: conv(s2) lrelu, then per layer
    conv(s2) GN(4) lrelu, conv(s1) GN(4) lrelu, final conv(s1) -> 1ch."""
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
    h = lrelu(_conv(params[0]["conv"], x, stride=2, pad=1))
    middle = params[1:-1]
    for i, layer in enumerate(middle):
        stride = 2 if i < len(middle) - 1 else 1  # last middle conv is stride 1
        h = _conv(layer["conv"], h, stride=stride, pad=1)
        h = lrelu(_gn(layer["norm"], h, 4))
    return _conv(params[-1]["conv"], h, stride=1, pad=1)


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.relu(1.0 - logits_real))
                  + jnp.mean(jax.nn.relu(1.0 + logits_fake)))


# ---------------------------------------------------------------------------
# Converters (torch state dicts -> param pytrees)
# ---------------------------------------------------------------------------


def _cv(sd, p):
    out = {"kernel": np.ascontiguousarray(np.transpose(sd[p + ".weight"], (2, 3, 1, 0)))}
    if p + ".bias" in sd:
        out["bias"] = np.asarray(sd[p + ".bias"])
    return out


def _dwcv(sd, p):
    """Depthwise torch conv [C,1,kh,kw] -> HWIO [kh,kw,1,C]."""
    out = {"kernel": np.ascontiguousarray(np.transpose(sd[p + ".weight"], (2, 3, 1, 0)))}
    if p + ".bias" in sd:
        out["bias"] = np.asarray(sd[p + ".bias"])
    return out


def _nb(sd, p):
    return {"scale": np.asarray(sd[p + ".weight"]), "bias": np.asarray(sd[p + ".bias"])}


def _linw(sd, p):
    return {"w": np.ascontiguousarray(sd[p + ".weight"].T), "b": np.asarray(sd[p + ".bias"])}


def _res_block_conv(sd, p):
    return {
        "conv1": _cv(sd, p + ".double_conv.0"),
        "norm1": _nb(sd, p + ".double_conv.1"),
        "conv2": _cv(sd, p + ".double_conv.3"),
        "norm2": _nb(sd, p + ".double_conv.4"),
        "res": _cv(sd, p + ".res_conv"),
    }


def convert_unet(sd, cfg: UNetConfig = UNET_SMALL2_YUV, prefix: str = "") -> dict:
    """``unet.*`` (or ``embedder.unet.*``) torch layout -> unet_forward params."""
    p = prefix
    nlev = len(cfg.z_channels_mults)
    return {
        "inc": _res_block_conv(sd, p + "inc"),
        "downs": [
            {"down": _cv(sd, f"{p}downs.{i}.down"),
             "conv": _res_block_conv(sd, f"{p}downs.{i}.conv")}
            for i in range(nlev - 1)
        ],
        "bottleneck": [
            _res_block_conv(sd, f"{p}bottleneck.model.{j}") for j in range(cfg.num_blocks)
        ],
        "ups": [
            {"up": {"conv": _cv(sd, f"{p}ups.{i}.up.upsample_block.2"),
                    "ln": _nb(sd, f"{p}ups.{i}.up.upsample_block.3")},
             "conv": _res_block_conv(sd, f"{p}ups.{i}.conv")}
            for i in range(nlev - 1)
        ],
        "outc": _cv(sd, p + "outc"),
    }


def convert_convnext(sd, cfg: ConvNeXtConfig = CONVNEXT_TINY,
                     prefix: str = "convnext.", head_prefix: str = "head.") -> dict:
    downsample = []
    for i in range(len(cfg.depths)):
        dp = f"{prefix}downsample_layers.{i}."
        if i == 0:
            downsample.append({"conv": _cv(sd, dp + "0"), "norm": _nb(sd, dp + "1")})
        else:
            downsample.append({"norm": _nb(sd, dp + "0"), "conv": _cv(sd, dp + "1")})
    stages = []
    for i, depth in enumerate(cfg.depths):
        blocks = []
        for j in range(depth):
            bp = f"{prefix}stages.{i}.{j}."
            blocks.append({
                "dwconv": _dwcv(sd, bp + "dwconv"),
                "norm": _nb(sd, bp + "norm"),
                "pwconv1": _linw(sd, bp + "pwconv1"),
                "grn": {"gamma": np.asarray(sd[bp + "grn.gamma"]).reshape(1, 1, 1, -1),
                        "beta": np.asarray(sd[bp + "grn.beta"]).reshape(1, 1, 1, -1)},
                "pwconv2": _linw(sd, bp + "pwconv2"),
            })
        stages.append(blocks)
    return {
        "downsample": downsample,
        "stages": stages,
        "head": _linw(sd, head_prefix + "linear"),
    }


def convert_discriminator(sd, n_layers: int = 3, prefix: str = "main.") -> List[dict]:
    """PatchGAN layout: main.0 conv, then (conv, GN) pairs, final conv."""
    params = [{"conv": _cv(sd, prefix + "0")}]
    idx = 2  # after first conv + lrelu
    for n in range(1, n_layers + 1):
        params.append({
            "conv": _cv(sd, f"{prefix}{idx}"),
            "norm": _nb(sd, f"{prefix}{idx + 1}"),
        })
        idx += 3
    params.append({"conv": _cv(sd, f"{prefix}{idx}")})
    return params


# ---------------------------------------------------------------------------
# Random init (training from scratch / tests)
# ---------------------------------------------------------------------------


def _rngc(rng, k, i, o, bias=True):
    p = {"kernel": rng.normal(0, (2.0 / (i * k * k)) ** 0.5, (k, k, i, o)).astype(np.float32)}
    if bias:
        p["bias"] = np.zeros((o,), np.float32)
    return p


def _rngnb(c):
    return {"scale": np.ones((c,), np.float32), "bias": np.zeros((c,), np.float32)}


def _rngl(rng, i, o):
    return {"w": rng.normal(0, i**-0.5, (i, o)).astype(np.float32),
            "b": np.zeros((o,), np.float32)}


def _rng_res(rng, i, o):
    return {"conv1": _rngc(rng, 3, i, o, bias=False), "norm1": _rngnb(o),
            "conv2": _rngc(rng, 3, o, o, bias=False), "norm2": _rngnb(o),
            "res": _rngc(rng, 1, i, o)}


def init_unet_params(seed: int, cfg: UNetConfig = UNET_SMALL2_YUV) -> dict:
    rng = np.random.default_rng(seed)
    z = [cfg.z_channels * m for m in cfg.z_channels_mults]
    downs = [{"down": _rngc(rng, 3, z[i], z[i + 1]),
              "conv": _rng_res(rng, z[i + 1], z[i + 1])} for i in range(len(z) - 1)]
    ups = []
    for i in reversed(range(len(z) - 1)):
        ups.append({"up": {"conv": _rngc(rng, 3, 2 * z[i + 1], z[i], bias=False),
                           "ln": _rngnb(z[i])},
                    "conv": _rng_res(rng, z[i], z[i])})
    return {
        "inc": _rng_res(rng, cfg.in_channels, z[0]),
        "downs": downs,
        "bottleneck": [_rng_res(rng, z[-1], z[-1]) for _ in range(cfg.num_blocks)],
        "ups": ups,
        "outc": _rngc(rng, 1, z[0], cfg.out_channels),
    }


def init_convnext_params(seed: int, cfg: ConvNeXtConfig = CONVNEXT_TINY) -> dict:
    rng = np.random.default_rng(seed)
    dims = cfg.dims
    downsample = [{"conv": _rngc(rng, 4, 3, dims[0]), "norm": _rngnb(dims[0])}]
    for i in range(len(dims) - 1):
        downsample.append({"norm": _rngnb(dims[i]), "conv": _rngc(rng, 2, dims[i], dims[i + 1])})
    stages = []
    for i, depth in enumerate(cfg.depths):
        d = dims[i]
        stages.append([
            {"dwconv": {"kernel": rng.normal(0, 0.02, (7, 7, 1, d)).astype(np.float32),
                        "bias": np.zeros((d,), np.float32)},
             "norm": _rngnb(d),
             "pwconv1": _rngl(rng, d, 4 * d),
             "grn": {"gamma": np.zeros((1, 1, 1, 4 * d), np.float32),
                     "beta": np.zeros((1, 1, 1, 4 * d), np.float32)},
             "pwconv2": _rngl(rng, 4 * d, d)}
            for _ in range(depth)
        ])
    return {"downsample": downsample, "stages": stages,
            "head": _rngl(rng, dims[-1], 1 + cfg.out_dim)}


def init_discriminator_params(seed: int, in_ch: int = 3, ndf: int = 32,
                              n_layers: int = 3) -> List[dict]:
    rng = np.random.default_rng(seed)
    params = [{"conv": _rngc(rng, 4, in_ch, ndf)}]
    nf, nf_prev = 1, 1
    for n in range(1, n_layers):
        nf_prev, nf = nf, min(2**n, 8)
        params.append({"conv": _rngc(rng, 4, ndf * nf_prev, ndf * nf),
                       "norm": _rngnb(ndf * nf)})
    nf_prev, nf = nf, min(2**n_layers, 8)
    params.append({"conv": _rngc(rng, 4, ndf * nf_prev, ndf * nf),
                   "norm": _rngnb(ndf * nf)})
    params.append({"conv": _rngc(rng, 4, ndf * nf, 1)})
    return params
