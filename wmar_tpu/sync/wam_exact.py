"""Exact WAM (Watermark Anything) port, weight-compatible with ``wam_mit.pth``.

Re-implements the reference's shipped sync backbone
(``deps/watermark_anything/models/wam.py:147,194`` and
``utils/inference_utils.py:37-70``) with the ``params.json`` configuration:

* embedder: ``vae_small`` — taming-style VAEEncoder (ch 32, mult (1,1,1,2),
  2 res blocks, z=4, no attention) + binary+concat MsgProcessor (nbits=32,
  hidden 64) + VAEDecoder (z=68, tanh out)  [``modules/vae.py``,
  ``modules/msg_processor.py``]
* extractor: ``sam_base`` — SAM/ViTDet image encoder (768d, 12 layers,
  12 heads, window 8, global attention at blocks 2/5/8/11, decomposed
  relative positions, LayerNorm neck) + bilinear PixelDecoder upscaling
  x4/x2/x2 to per-pixel (1+32)-channel logits  [``modules/vit.py``,
  ``modules/pixel_decoder.py``]
* JND attenuation ``jnd_1_3_blue`` with scaling_w=2.0, scaling_i=1.0
  [``modules/jnd.py``]
* ImageNet normalize/unnormalize around everything
  [``data/transforms.py:10-16``]

The VAE reuses the existing taming Encoder/Decoder Flax modules (identical
architecture lineage); the ViT/pixel-decoder/JND are pure-function JAX with
params converted by ``convert_wam``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wmar_tpu.models.vqgan import Decoder, Encoder, VQGANConfig

IMAGE_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGE_STD = np.array([0.229, 0.224, 0.225], np.float32)

WAM_ENC_CFG = VQGANConfig(
    resolution=256, ch=32, ch_mult=(1, 1, 1, 2), num_res_blocks=2,
    attn_resolutions=(), z_channels=4, n_embed=1, embed_dim=4, double_z=False,
)
WAM_DEC_CFG = VQGANConfig(
    resolution=256, ch=32, ch_mult=(1, 1, 1, 2), num_res_blocks=2,
    attn_resolutions=(), z_channels=68, n_embed=1, embed_dim=68, out_channels=3,
)


@dataclasses.dataclass(frozen=True)
class SAMViTConfig:
    img_size: int = 256
    patch_size: int = 16
    embed_dim: int = 768
    out_chans: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    window_size: int = 8
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size


SAM_BASE = SAMViTConfig()
NBITS = 32
SCALING_W = 2.0
SCALING_I = 1.0


# ---------------------------------------------------------------------------
# SAM/ViTDet encoder (pure functions)
# ---------------------------------------------------------------------------


def _ln(p, x, eps=1e-6):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _lin(p, x):
    return x @ p["w"] + p["b"] if "b" in p else x @ p["w"]


def _window_partition(x, ws):
    b, h, w, c = x.shape
    ph, pw = (-h) % ws, (-w) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c), (hp, wp)


def _window_unpartition(wins, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = wins.shape[0] // (hp * wp // ws // ws)
    x = wins.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _rel_pos(q_size, k_size, rel):
    """Relative-position table lookup (vit.py get_rel_pos; sizes match the
    training resolution so no interpolation branch is needed)."""
    coords = (np.arange(q_size)[:, None] - np.arange(k_size)[None, :]) + (k_size - 1)
    return rel[jnp.asarray(coords)]


def _attention(p, x, num_heads):
    b, h, w, c = x.shape
    hd = c // num_heads
    qkv = _lin(p["qkv"], x).reshape(b, h * w, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = (t.reshape(b * num_heads, h * w, hd) for t in (qkv[0], qkv[1], qkv[2]))
    attn = (q * hd**-0.5) @ k.transpose(0, 2, 1)
    # decomposed rel pos (vit.py add_decomposed_rel_pos)
    rh = _rel_pos(h, h, p["rel_pos_h"])
    rw = _rel_pos(w, w, p["rel_pos_w"])
    r_q = q.reshape(b * num_heads, h, w, hd)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw)
    attn = attn.reshape(-1, h, w, h, w) + rel_h[..., None] + rel_w[:, :, :, None, :]
    attn = jax.nn.softmax(attn.reshape(-1, h * w, h * w), axis=-1)
    out = (attn @ v).reshape(b, num_heads, h, w, hd).transpose(0, 2, 3, 1, 4).reshape(b, h, w, c)
    return _lin(p["proj"], out)


def sam_encoder(params: dict, cfg: SAMViTConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Images NHWC (imagenet-normalized) -> features [B, grid, grid, out_chans]."""
    h = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["kernel"],
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed"]["bias"]
    h = h + params["pos_embed"]
    for i, blk in enumerate(params["blocks"]):
        ws = 0 if i in cfg.global_attn_indexes else cfg.window_size
        shortcut = h
        hn = _ln(blk["norm1"], h)
        if ws > 0:
            hn, pad_hw = _window_partition(hn, ws)
            hn = _attention(blk["attn"], hn, cfg.num_heads)
            hn = _window_unpartition(hn, ws, pad_hw, (h.shape[1], h.shape[2]))
        else:
            hn = _attention(blk["attn"], hn, cfg.num_heads)
        h = shortcut + hn
        hm = _ln(blk["norm2"], h)
        h = h + _lin(blk["mlp_lin2"], jax.nn.gelu(_lin(blk["mlp_lin1"], hm), approximate=False))
    # neck: conv1x1(no bias), LN, conv3x3(no bias), LN — channels_first LN is
    # an over-channels LN, i.e. plain LN on the NHWC channel axis
    h = jax.lax.conv_general_dilated(
        h, params["neck0"]["kernel"], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    h = _ln(params["neck1"], h)
    h = jax.lax.conv_general_dilated(
        h, params["neck2"]["kernel"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return _ln(params["neck3"], h)


def torch_bilinear_up(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """torch ``Upsample(scale_factor=f, mode=bilinear, align_corners=False)``
    bit-exact (half-pixel sampling with edge clamping; jax.image.resize
    differs at borders)."""
    b, h, w, c = x.shape

    def axis_weights(n):
        src = (jnp.arange(n * factor, dtype=jnp.float32) + 0.5) / factor - 0.5
        src = jnp.clip(src, 0.0, n - 1.0)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n - 1)
        wgt = src - lo
        return lo, hi, wgt

    lo_h, hi_h, w_h = axis_weights(h)
    x = x[:, lo_h] * (1.0 - w_h)[None, :, None, None] + x[:, hi_h] * w_h[None, :, None, None]
    lo_w, hi_w, w_w = axis_weights(w)
    x = x[:, :, lo_w] * (1.0 - w_w)[None, None, :, None] + x[:, :, hi_w] * w_w[None, None, :, None]
    return x


def pixel_decoder(params: List[dict], feats: jnp.ndarray, factors=None) -> jnp.ndarray:
    """x4/x2/x2 bilinear upscaling stages + 1x1 head -> [B, H, W, 1+nbits]."""
    h = feats
    factors = factors or [int(s["factor"]) for s in params[:-1]]
    for stage, f in zip(params[:-1], factors):
        h = torch_bilinear_up(h, f)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        h = jax.lax.conv_general_dilated(
            h, stage["conv"]["kernel"], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        h = jax.nn.gelu(_ln(stage["ln"], h), approximate=False)
    last = params[-1]
    return jax.lax.conv_general_dilated(
        h, last["kernel"], (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + last["bias"]


# ---------------------------------------------------------------------------
# Msg processor + JND
# ---------------------------------------------------------------------------


def msg_concat(emb_table: jnp.ndarray, latents: jnp.ndarray, msgs: jnp.ndarray) -> jnp.ndarray:
    """binary+concat (msg_processor.py:96-118): indices 2k + bit_k, summed
    embeddings tiled over the latent grid, concatenated on channels."""
    k = msgs.shape[-1]
    idx = 2 * jnp.arange(k)[None, :] + msgs.astype(jnp.int32)  # [B, k]
    msg_aux = emb_table[idx].sum(axis=1)  # [B, d]
    b, h, w, _ = latents.shape
    tiled = jnp.broadcast_to(msg_aux[:, None, None, :], (b, h, w, msg_aux.shape[-1]))
    return jnp.concatenate([latents, tiled], axis=-1)


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float32)
_LUM = np.array(
    [[1, 1, 1, 1, 1], [1, 2, 2, 2, 1], [1, 2, 0, 2, 1], [1, 2, 2, 2, 1], [1, 1, 1, 1, 1]],
    np.float32,
)


def _fixed_conv(x1, kernel):
    k = jnp.asarray(kernel)[:, :, None, None]
    pad = kernel.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x1, k, (1, 1), ((pad, pad), (pad, pad)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def jnd_heatmaps(imgs01: jnp.ndarray, blue: bool = True, clc: float = 0.3) -> jnp.ndarray:
    """jnd_1_3(_blue): luminance+contrast masking heatmap (jnd.py:69-110)."""
    x = 255.0 * imgs01
    lum = (x * jnp.asarray([0.299, 0.587, 0.114])).sum(-1, keepdims=True)
    la = _fixed_conv(lum, _LUM) / 32.0
    la_low = 17.0 * (1.0 - jnp.sqrt(jnp.maximum(la / 127.0, 0.0) + 1e-5))
    la_high = 3.0 / 128.0 * (la - 127.0) + 3.0
    la = jnp.where(la <= 127.0, la_low, la_high)
    gx = _fixed_conv(lum, _SOBEL_X)
    gy = _fixed_conv(lum, _SOBEL_Y)
    cm = jnp.sqrt(gx**2 + gy**2)
    cm = 0.117 * (16.0 * cm**2.4 / (cm**2 + 26.0**2))
    hmap = jnp.maximum(la + cm - clc * jnp.minimum(la, cm), 0.0)
    hmap = jnp.repeat(hmap, 3, axis=-1)
    if blue:
        hmap = hmap * jnp.asarray([0.5, 0.5, 1.0])
    return hmap / 255.0


# ---------------------------------------------------------------------------
# The WAM wrapper (embed/detect in [0,1] space)
# ---------------------------------------------------------------------------


def _normalize(x01):
    return (x01 - IMAGE_MEAN) / IMAGE_STD


def _unnormalize(xn):
    return xn * IMAGE_STD + IMAGE_MEAN


class WamExact:
    """``Wam.embed``/``Wam.detect`` on converted ``wam_mit.pth`` params.

    Interface matches ``wam_logic.WamSync``'s pluggable embedder:
      embed(img01 [B,H,W,3], msg [B,32]) -> watermarked img01
      detect(img01 [B,H,W,3]) -> [B, 33, H, W] logits (mask + 32 bits)
    """

    def __init__(self, params: dict, vit_cfg: SAMViTConfig = SAM_BASE,
                 enc_cfg: VQGANConfig = WAM_ENC_CFG, dec_cfg: VQGANConfig = WAM_DEC_CFG):
        # pull the static "factor" metadata out of the pytree so jit
        # doesn't trace it as a dynamic argument
        self.factors = tuple(int(s["factor"]) for s in params["pixel_decoder"][:-1])
        params = dict(params)
        params["pixel_decoder"] = [
            {k: v for k, v in s.items() if k != "factor"} for s in params["pixel_decoder"]
        ]
        self.params = jax.tree.map(jnp.asarray, params)
        self.vit_cfg = vit_cfg
        self.enc_cfg = enc_cfg
        self.dec_cfg = dec_cfg
        self._embed = jax.jit(self._embed_fn)
        self._detect = jax.jit(self._detect_fn)

    def _embed_fn(self, params, img01, msgs):
        x = _normalize(img01)
        latents = Encoder(self.enc_cfg).apply({"params": params["vae_encoder"]}, x)
        latents = msg_concat(params["msg_embeddings"], latents, msgs)
        delta = Decoder(self.dec_cfg).apply({"params": params["vae_decoder"]}, latents)
        delta = jnp.tanh(delta)  # vae_small decoder has tanh_out=True
        imgs_w = SCALING_I * x + SCALING_W * delta
        # JND attenuation happens in [0,1] space (preprocess=unnormalize)
        i01 = _unnormalize(x)
        w01 = _unnormalize(imgs_w)
        hmaps = jnd_heatmaps(i01, blue=True)
        out01 = i01 + 1.0 * hmaps * (w01 - i01)
        return jnp.clip(out01, 0.0, 1.0)

    def _detect_fn(self, params, img01):
        x = _normalize(img01)
        feats = sam_encoder(params["vit"], self.vit_cfg, x)
        preds = pixel_decoder(params["pixel_decoder"], feats, self.factors)
        return preds.transpose(0, 3, 1, 2)  # [B, 1+nbits, H, W]

    def embed(self, img01, msgs):
        return self._embed(self.params, img01, msgs)

    def detect(self, img01):
        return self._detect(self.params, img01)

    @staticmethod
    def load(ckpt_path: str) -> "WamExact":
        from wmar_tpu.utils.convert import load_torch_state_dict

        return WamExact(convert_wam(load_torch_state_dict(ckpt_path)))


# ---------------------------------------------------------------------------
# Conversion from the wam_mit.pth state dict
# ---------------------------------------------------------------------------


def _cv(sd, p):
    out = {"kernel": np.ascontiguousarray(np.transpose(sd[p + ".weight"], (2, 3, 1, 0)))}
    if p + ".bias" in sd:
        out["bias"] = np.asarray(sd[p + ".bias"])
    return out


def _lnp(sd, p):
    return {"scale": np.asarray(sd[p + ".weight"]), "bias": np.asarray(sd[p + ".bias"])}


def _linp(sd, p):
    out = {"w": np.ascontiguousarray(sd[p + ".weight"].T)}
    if p + ".bias" in sd:
        out["b"] = np.asarray(sd[p + ".bias"])
    return out


def convert_vit(sd, vit_cfg: SAMViTConfig, prefix: str) -> dict:
    """ViTDet ``ImageEncoderViT`` state dict -> :func:`sam_encoder` params.

    Shared by WAM's detector and syncseal's ``SegmentationExtractor`` — the
    reference modules are byte-identical (``watermark_anything/modules/vit.py``
    vs ``syncseal/syncseal/modules/vit.py``)."""
    blocks = []
    for i in range(vit_cfg.depth):
        p = f"{prefix}blocks.{i}."
        blocks.append(
            {
                "norm1": _lnp(sd, p + "norm1"),
                "norm2": _lnp(sd, p + "norm2"),
                "attn": {
                    "qkv": _linp(sd, p + "attn.qkv"),
                    "proj": _linp(sd, p + "attn.proj"),
                    "rel_pos_h": np.asarray(sd[p + "attn.rel_pos_h"]),
                    "rel_pos_w": np.asarray(sd[p + "attn.rel_pos_w"]),
                },
                "mlp_lin1": _linp(sd, p + "mlp.lin1"),
                "mlp_lin2": _linp(sd, p + "mlp.lin2"),
            }
        )
    return {
        "patch_embed": {
            "kernel": np.ascontiguousarray(
                np.transpose(sd[prefix + "patch_embed.proj.weight"], (2, 3, 1, 0))
            ),
            "bias": np.asarray(sd[prefix + "patch_embed.proj.bias"]),
        },
        "pos_embed": np.asarray(sd[prefix + "pos_embed"]),
        "blocks": blocks,
        "neck0": _cv(sd, prefix + "neck.0"),
        "neck1": _lnp(sd, prefix + "neck.1"),
        "neck2": _cv(sd, prefix + "neck.2"),
        "neck3": _lnp(sd, prefix + "neck.3"),
    }


def convert_pixel_decoder(sd, upscale_stages, prefix: str) -> List[dict]:
    """``PixelDecoder`` state dict -> :func:`pixel_decoder` params (same
    sharing as :func:`convert_vit`)."""
    pd = []
    for si, factor in enumerate(upscale_stages):
        p = f"{prefix}output_upscaling.{si}.upsample_block."
        pd.append({"factor": factor, "conv": _cv(sd, p + "2"), "ln": _lnp(sd, p + "3")})
    pd.append(_cv(sd, prefix + "last_layer"))
    return pd


def convert_wam(sd, vit_cfg: SAMViTConfig = SAM_BASE, upscale_stages=(4, 2, 2),
                enc_cfg: VQGANConfig = WAM_ENC_CFG,
                dec_cfg: VQGANConfig = WAM_DEC_CFG) -> dict:
    """``wam_mit.pth`` -> WamExact params (embedder VAE via the taming
    converter; ViT/pixel-decoder per the layouts above). Attenuation convs
    are fixed kernels and augmenter params are training-only — both skipped."""
    from wmar_tpu.utils.convert import (
        _convert_taming_decoder,
        _convert_taming_encoder,
    )

    return {
        "vae_encoder": _convert_taming_encoder(sd, enc_cfg, "embedder.encoder."),
        "msg_embeddings": np.asarray(sd["embedder.msg_processor.msg_embeddings.weight"]),
        "vae_decoder": _convert_taming_decoder(sd, dec_cfg, "embedder.decoder."),
        "vit": convert_vit(sd, vit_cfg, "detector.image_encoder."),
        "pixel_decoder": convert_pixel_decoder(sd, upscale_stages, "detector.pixel_decoder."),
    }


def init_vit_params(rng: np.random.Generator, vit_cfg: SAMViTConfig) -> dict:
    """Random ViTDet encoder params with converted-checkpoint shapes."""

    def lin(i, o):
        return {"w": rng.normal(0, i**-0.5, (i, o)).astype(np.float32),
                "b": np.zeros((o,), np.float32)}

    def ln(c):
        return {"scale": np.ones((c,), np.float32), "bias": np.zeros((c,), np.float32)}

    d, hd = vit_cfg.embed_dim, vit_cfg.embed_dim // vit_cfg.num_heads
    blocks = []
    for i in range(vit_cfg.depth):
        size = vit_cfg.grid if i in vit_cfg.global_attn_indexes else vit_cfg.window_size
        blocks.append(
            {
                "norm1": ln(d), "norm2": ln(d),
                "attn": {
                    "qkv": lin(d, 3 * d), "proj": lin(d, d),
                    "rel_pos_h": np.zeros((2 * size - 1, hd), np.float32),
                    "rel_pos_w": np.zeros((2 * size - 1, hd), np.float32),
                },
                "mlp_lin1": lin(d, int(d * vit_cfg.mlp_ratio)),
                "mlp_lin2": lin(int(d * vit_cfg.mlp_ratio), d),
            }
        )
    oc = vit_cfg.out_chans
    return {
        "patch_embed": {
            "kernel": rng.normal(0, 0.02, (vit_cfg.patch_size, vit_cfg.patch_size, 3, d)
                                 ).astype(np.float32),
            "bias": np.zeros((d,), np.float32),
        },
        "pos_embed": np.zeros((1, vit_cfg.grid, vit_cfg.grid, d), np.float32),
        "blocks": blocks,
        "neck0": {"kernel": rng.normal(0, d**-0.5, (1, 1, d, oc)).astype(np.float32)},
        "neck1": ln(oc),
        "neck2": {"kernel": rng.normal(0, (oc * 9) ** -0.5, (3, 3, oc, oc)).astype(np.float32)},
        "neck3": ln(oc),
    }


def init_pixel_decoder_params(rng: np.random.Generator, out_chans: int,
                              upscale_stages, out_channels: int) -> List[dict]:
    """Random PixelDecoder params (``out_channels`` = 1 + nbits/nparams)."""

    def ln(c):
        return {"scale": np.ones((c,), np.float32), "bias": np.zeros((c,), np.float32)}

    pd, ch = [], out_chans
    for factor in upscale_stages:
        out_ch = ch // factor
        pd.append({
            "factor": factor,
            "conv": {"kernel": rng.normal(0, (2.0 / (ch * 9)) ** 0.5,
                                          (3, 3, ch, out_ch)).astype(np.float32)},
            "ln": ln(out_ch),
        })
        ch = out_ch
    pd.append({"kernel": rng.normal(0, (2.0 / ch) ** 0.5,
                                    (1, 1, ch, out_channels)).astype(np.float32),
               "bias": np.zeros((out_channels,), np.float32)})
    return pd


def init_wam_params(seed: int, vit_cfg: SAMViTConfig = SAM_BASE,
                    enc_cfg: VQGANConfig = WAM_ENC_CFG,
                    dec_cfg: VQGANConfig = WAM_DEC_CFG,
                    nbits: int = NBITS, upscale_stages=(4, 2, 2)) -> dict:
    """Random params with converted-checkpoint shapes (tests / training)."""
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    hidden = 2 * nbits
    enc_vars = Encoder(enc_cfg).init(key, jnp.zeros((1, enc_cfg.resolution, enc_cfg.resolution, 3)))
    dec_in = enc_cfg.z_channels + hidden
    dec_vars = Decoder(dec_cfg).init(
        key, jnp.zeros((1, dec_cfg.codes_per_side, dec_cfg.codes_per_side, dec_in))
    )
    return {
        "vae_encoder": jax.tree.map(np.asarray, enc_vars["params"]),
        "msg_embeddings": rng.normal(0, 1, (2 * nbits, hidden)).astype(np.float32),
        "vae_decoder": jax.tree.map(np.asarray, dec_vars["params"]),
        "vit": init_vit_params(rng, vit_cfg),
        "pixel_decoder": init_pixel_decoder_params(
            rng, vit_cfg.out_chans, upscale_stages, 1 + nbits),
    }
