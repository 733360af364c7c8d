"""Diffusers AutoencoderKL compressors (SD-VAE / SDXL-fp16 / FLUX).

Weight-compatible JAX port of ``diffusers.models.autoencoders.autoencoder_kl.
AutoencoderKL`` as used by the reference's ``DiffusersCompression``
(``wmar/augmentations/neuralcompression.py:119-225``): encode -> sample the
diagonal Gaussian -> decode, reporting the model's fixed nominal bpp (the
reference hard-codes 2 / 1 / 1 / 2 for sd / sdxl / dc-ae / flux).

State-dict layout converted (diffusers naming):
``encoder.down_blocks.{i}.resnets.{j}.{norm1,conv1,norm2,conv2,conv_shortcut}``,
``...downsamplers.0.conv``, ``encoder.mid_block.{resnets.{0,1},attentions.0.
{group_norm,to_q,to_k,to_v,to_out.0}}``, ``encoder.conv_norm_out/conv_out``,
``quant_conv``/``post_quant_conv`` (absent for FLUX), and the mirrored
``decoder.up_blocks...`` tree.

The DC-AE (EfficientViT) architecture lives in
:mod:`wmar_tpu.augmentations.dcae` and is dispatched from here for the
``diffusers-deep-compression`` name, completing the reference's 22-codec
bank.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DN = ("NHWC", "HWIO", "NHWC")


@dataclasses.dataclass(frozen=True)
class KLVAEConfig:
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    use_quant_conv: bool = True
    nominal_bpp: float = 2.0

    @staticmethod
    def for_name(name: str, tiny: bool = False) -> "KLVAEConfig":
        if tiny:
            return KLVAEConfig((8, 16), 1, 4, 4, use_quant_conv="flux" not in name,
                               nominal_bpp=2.0)
        if "flux" in name:
            # black-forest-labs/FLUX.1-schnell vae: f8, 16 latent ch, no quant convs
            return KLVAEConfig(latent_channels=16, use_quant_conv=False, nominal_bpp=2.0)
        if "fp16" in name or "sdxl" in name:
            return KLVAEConfig(nominal_bpp=1.0)  # madebyollin/sdxl-vae-fp16-fix
        return KLVAEConfig(nominal_bpp=2.0)  # stabilityai/sd-vae-ft-ema


def _conv(p, x, stride=1, pad=1):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), ((pad, pad), (pad, pad)), dimension_numbers=DN
    )
    return y + p["bias"]


def _group_norm(p, x, groups):
    b, h, w, c = x.shape
    xg = x.reshape(b, h, w, groups, c // groups)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + 1e-6)
    return xg.reshape(b, h, w, c) * p["scale"] + p["bias"]


def _resnet(p, x, groups):
    h = _conv(p["conv1"], jax.nn.silu(_group_norm(p["norm1"], x, groups)))
    h = _conv(p["conv2"], jax.nn.silu(_group_norm(p["norm2"], h, groups)))
    if "conv_shortcut" in p:
        x = _conv(p["conv_shortcut"], x, pad=0)
    return x + h


def _attention(p, x, groups):
    b, hh, ww, c = x.shape
    residual = x
    h = _group_norm(p["group_norm"], x, groups).reshape(b, hh * ww, c)
    q = h @ p["to_q"]["w"] + p["to_q"]["b"]
    k = h @ p["to_k"]["w"] + p["to_k"]["b"]
    v = h @ p["to_v"]["w"] + p["to_v"]["b"]
    attn = jax.nn.softmax(q @ k.transpose(0, 2, 1) / jnp.sqrt(c), axis=-1)
    out = (attn @ v) @ p["to_out"]["w"] + p["to_out"]["b"]
    return out.reshape(b, hh, ww, c) + residual


def encode(params: dict, cfg: KLVAEConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x [-1,1] NHWC -> moments [B, H/f, W/f, 2*latent]."""
    g = cfg.norm_num_groups
    h = _conv(params["conv_in"], x)
    for i in range(len(cfg.block_out_channels)):
        blk = params["down_blocks"][i]
        for r in blk["resnets"]:
            h = _resnet(r, h, g)
        if "downsample" in blk:
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = _conv(blk["downsample"], h, stride=2, pad=0)
    mid = params["mid_block"]
    h = _resnet(mid["resnets"][0], h, g)
    h = _attention(mid["attn"], h, g)
    h = _resnet(mid["resnets"][1], h, g)
    h = jax.nn.silu(_group_norm(params["conv_norm_out"], h, g))
    moments = _conv(params["conv_out"], h)
    if cfg.use_quant_conv:
        moments = _conv(params["quant_conv"], moments, pad=0)
    return moments


def decode(params: dict, cfg: KLVAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    g = cfg.norm_num_groups
    if cfg.use_quant_conv:
        z = _conv(params["post_quant_conv"], z, pad=0)
    h = _conv(params["conv_in_dec"], z)
    mid = params["mid_block_dec"]
    h = _resnet(mid["resnets"][0], h, g)
    h = _attention(mid["attn"], h, g)
    h = _resnet(mid["resnets"][1], h, g)
    for i in range(len(cfg.block_out_channels)):
        blk = params["up_blocks"][i]
        for r in blk["resnets"]:
            h = _resnet(r, h, g)
        if "upsample" in blk:
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
            h = _conv(blk["upsample"], h)
    h = jax.nn.silu(_group_norm(params["conv_norm_out_dec"], h, g))
    return _conv(params["conv_out_dec"], h)


def sample_posterior(moments: jnp.ndarray, rng) -> jnp.ndarray:
    mean, logvar = jnp.split(moments, 2, axis=-1)
    std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
    return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)


def kl_vae_forward(params, cfg: KLVAEConfig, x01, rng):
    """[0,1] -> [0,1] round trip matching DiffusersCompression.forward
    (AutoencoderKL path feeds raw [0,1] images; only DC-AE rescales)."""
    moments = encode(params, cfg, x01)
    z = sample_posterior(moments, rng)
    return decode(params, cfg, z)


# ---------------------------------------------------------------------------
# conversion + random init
# ---------------------------------------------------------------------------


def _cv(sd, p):
    return {"kernel": np.ascontiguousarray(np.transpose(sd[p + ".weight"], (2, 3, 1, 0))),
            "bias": np.asarray(sd[p + ".bias"])}


def _gn(sd, p):
    return {"scale": np.asarray(sd[p + ".weight"]), "bias": np.asarray(sd[p + ".bias"])}


def _lin(sd, p):
    return {"w": np.ascontiguousarray(sd[p + ".weight"].T), "b": np.asarray(sd[p + ".bias"])}


def _res(sd, p):
    out = {"norm1": _gn(sd, p + ".norm1"), "conv1": _cv(sd, p + ".conv1"),
           "norm2": _gn(sd, p + ".norm2"), "conv2": _cv(sd, p + ".conv2")}
    if p + ".conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _cv(sd, p + ".conv_shortcut")
    return out


def _mid(sd, p):
    return {
        "resnets": [_res(sd, p + ".resnets.0"), _res(sd, p + ".resnets.1")],
        "attn": {
            "group_norm": _gn(sd, p + ".attentions.0.group_norm"),
            "to_q": _lin(sd, p + ".attentions.0.to_q"),
            "to_k": _lin(sd, p + ".attentions.0.to_k"),
            "to_v": _lin(sd, p + ".attentions.0.to_v"),
            "to_out": _lin(sd, p + ".attentions.0.to_out.0"),
        },
    }


def convert_kl_vae(sd, cfg: KLVAEConfig) -> dict:
    """diffusers AutoencoderKL state dict -> forward params."""
    nlev = len(cfg.block_out_channels)
    down = []
    for i in range(nlev):
        blk = {"resnets": [
            _res(sd, f"encoder.down_blocks.{i}.resnets.{j}")
            for j in range(cfg.layers_per_block)
        ]}
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            blk["downsample"] = _cv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
        down.append(blk)
    up = []
    for i in range(nlev):
        blk = {"resnets": [
            _res(sd, f"decoder.up_blocks.{i}.resnets.{j}")
            for j in range(cfg.layers_per_block + 1)
        ]}
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            blk["upsample"] = _cv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
        up.append(blk)
    params = {
        "conv_in": _cv(sd, "encoder.conv_in"),
        "down_blocks": down,
        "mid_block": _mid(sd, "encoder.mid_block"),
        "conv_norm_out": _gn(sd, "encoder.conv_norm_out"),
        "conv_out": _cv(sd, "encoder.conv_out"),
        "conv_in_dec": _cv(sd, "decoder.conv_in"),
        "mid_block_dec": _mid(sd, "decoder.mid_block"),
        "up_blocks": up,
        "conv_norm_out_dec": _gn(sd, "decoder.conv_norm_out"),
        "conv_out_dec": _cv(sd, "decoder.conv_out"),
    }
    if cfg.use_quant_conv:
        params["quant_conv"] = _cv(sd, "quant_conv")
        params["post_quant_conv"] = _cv(sd, "post_quant_conv")
    return params


def init_kl_vae_params(seed: int, cfg: KLVAEConfig) -> dict:
    rng = np.random.default_rng(seed)

    def cv(i, o, k=3):
        fan = i * k * k
        return {"kernel": rng.normal(0, (2.0 / fan) ** 0.5, (k, k, i, o)).astype(np.float32),
                "bias": np.zeros((o,), np.float32)}

    def gn(c):
        return {"scale": np.ones((c,), np.float32), "bias": np.zeros((c,), np.float32)}

    def lin(i, o):
        return {"w": rng.normal(0, i**-0.5, (i, o)).astype(np.float32),
                "b": np.zeros((o,), np.float32)}

    def res(i, o):
        out = {"norm1": gn(i), "conv1": cv(i, o), "norm2": gn(o), "conv2": cv(o, o)}
        if i != o:
            out["conv_shortcut"] = cv(i, o, 1)
        return out

    def mid(c):
        return {"resnets": [res(c, c), res(c, c)],
                "attn": {"group_norm": gn(c), "to_q": lin(c, c), "to_k": lin(c, c),
                         "to_v": lin(c, c), "to_out": lin(c, c)}}

    ch = cfg.block_out_channels
    down, prev = [], ch[0]
    for i, c in enumerate(ch):
        blk = {"resnets": [res(prev if j == 0 else c, c) for j in range(cfg.layers_per_block)]}
        if i != len(ch) - 1:
            blk["downsample"] = cv(c, c)
        down.append(blk)
        prev = c
    rev = list(reversed(ch))
    up, prev = [], rev[0]
    for i, c in enumerate(rev):
        blk = {"resnets": [res(prev if j == 0 else c, c)
                           for j in range(cfg.layers_per_block + 1)]}
        if i != len(ch) - 1:
            blk["upsample"] = cv(c, c)
        up.append(blk)
        prev = c
    z = cfg.latent_channels
    params = {
        "conv_in": cv(3, ch[0]),
        "down_blocks": down,
        "mid_block": mid(ch[-1]),
        "conv_norm_out": gn(ch[-1]),
        "conv_out": cv(ch[-1], 2 * z),
        "conv_in_dec": cv(z, ch[-1]),
        "mid_block_dec": mid(ch[-1]),
        "up_blocks": up,
        "conv_norm_out_dec": gn(ch[0]),
        "conv_out_dec": cv(ch[0], 3),
    }
    if cfg.use_quant_conv:
        params["quant_conv"] = cv(2 * z, 2 * z, 1)
        params["post_quant_conv"] = cv(z, z, 1)
    return params


# ---------------------------------------------------------------------------
# attack wrapper
# ---------------------------------------------------------------------------


class DiffusersCompression:
    """Callable attack mirroring the reference's DiffusersCompression:
    resize to a multiple of 16, VAE round trip, resize back; bpp is the
    model's nominal value (neuralcompression.py:185-225)."""

    def __init__(self, name: str, cfg, params, random_weights=False):
        self.name = name
        self.cfg = cfg
        self.params = jax.tree.map(jnp.asarray, params)
        self.random_weights = random_weights
        self.bpp = cfg.nominal_bpp
        if isinstance(cfg, KLVAEConfig):
            self._fn = jax.jit(lambda p, x, r: kl_vae_forward(p, cfg, x, r))
        else:  # DCAEConfig: deterministic round trip, rng unused
            from wmar_tpu.augmentations.dcae import dcae_roundtrip

            self._fn = jax.jit(lambda p, x, r: dcae_roundtrip(p, cfg, x))

    def __call__(self, imgs01, return_bpp: bool = False, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        b, h, w, c = imgs01.shape
        h16, w16 = -(-h // 16) * 16, -(-w // 16) * 16
        x = imgs01
        if (h16, w16) != (h, w):
            x = jax.image.resize(x, (b, h16, w16, c), "bilinear")
        rec = self._fn(self.params, x, rng)
        if rec.shape != imgs01.shape:
            rec = jax.image.resize(rec, imgs01.shape, "bilinear")
        rec = jnp.clip(rec, 0.0, 1.0)
        return (rec, jnp.float32(self.bpp)) if return_bpp else rec

    @staticmethod
    def from_name(name, weights_dir=None, allow_random=False, image_size=256,
                  tiny=False):
        from wmar_tpu.augmentations.neural import RandomWeightsError

        if "deep-compression" in name or "dc-ae" in name:
            return _dcae_from_name(name, weights_dir, allow_random, tiny)
        cfg = KLVAEConfig.for_name(name, tiny=tiny)
        params, random_weights = None, True
        if weights_dir:
            for ext in (".safetensors", ".bin", ".pth"):
                path = os.path.join(weights_dir, name + ext)
                if os.path.exists(path):
                    from wmar_tpu.utils.convert import load_torch_state_dict

                    params = convert_kl_vae(load_torch_state_dict(path), cfg)
                    random_weights = False
                    break
        if params is None:
            if not allow_random and not tiny:
                raise RandomWeightsError(
                    f"no weights for diffusers codec '{name}' in {weights_dir!r}; "
                    "pass allow_random=True to acknowledge a destructive slot."
                )
            params = init_kl_vae_params(0, cfg)
            if not tiny:
                print(f"WARNING: {name} running with RANDOM weights.")
        return DiffusersCompression(name, cfg, params, random_weights and not tiny)


def _dcae_from_name(name, weights_dir, allow_random, tiny):
    """Build the reference's DeepCompressionAE slot
    (``mit-han-lab/dc-ae-f64c128-in-1.0-diffusers``, nominal bpp 1): converts
    a raw diffusers state dict on the fly via the shape-driven
    :func:`wmar_tpu.augmentations.dcae.convert_dcae`."""
    import os as _os

    from wmar_tpu.augmentations.dcae import DCAEConfig, convert_dcae, init_dcae_params
    from wmar_tpu.augmentations.neural import RandomWeightsError

    params, cfg = None, None
    if weights_dir:
        for ext in (".safetensors", ".bin", ".pth"):
            path = _os.path.join(weights_dir, name + ext)
            if _os.path.exists(path):
                from wmar_tpu.utils.convert import load_torch_state_dict

                params, cfg = convert_dcae(load_torch_state_dict(path))
                break
    random_weights = params is None
    if random_weights:
        if not allow_random and not tiny:
            raise RandomWeightsError(
                f"no weights for diffusers codec '{name}' in {weights_dir!r}; "
                "pass allow_random=True to acknowledge a destructive slot."
            )
        cfg = DCAEConfig.tiny(deep_stem=True)
        params = init_dcae_params(0, cfg)
        if not tiny:
            print(f"WARNING: {name} running with RANDOM weights.")
    return DiffusersCompression(name, cfg, params, random_weights and not tiny)
