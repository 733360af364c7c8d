"""SyncSeal model-zoo variants beyond the shipped checkpoint pair.

The reference registers more architectures than its released config uses
(``syncseal/syncseal/models/embedder.py:24-110``, ``extractor.py:44-110``):

* ``vae*``  embedder  — taming-style VAEEncoder -> VAEDecoder with
  GroupNorm(16) (``syncseal/modules/vae.py:24``), preprocess ``*2-1``.
* ``sam*``  extractor — ViTDet ``ImageEncoderViT`` + ``PixelDecoder``
  (``syncseal/modules/vit.py``, ``pixel_decoder.py``); NO ``*2-1``
  preprocess (``extractor.py:84-96`` feeds imgs straight in), output is a
  per-pixel ``[B, 1+nparams, H, W]`` map.

Both reuse existing exact ports: the VAE maps onto
:mod:`wmar_tpu.models.vqgan` (``norm_groups=16``), the ViT/pixel-decoder
onto :mod:`wmar_tpu.sync.wam_exact` (the reference files are byte-identical
to watermark_anything's). This module provides the forward functions,
shape-compatible converters, and random init for tests/training.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wmar_tpu.models.vqgan import Decoder, Encoder, VQGANConfig
from wmar_tpu.sync.wam_exact import (
    SAMViTConfig,
    convert_pixel_decoder,
    convert_vit,
    init_pixel_decoder_params,
    init_vit_params,
    pixel_decoder,
    sam_encoder,
)

# ---------------------------------------------------------------------------
# VAE embedder (embedder.py:38-67)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class VAEEmbedderConfig:
    encoder: VQGANConfig
    decoder: VQGANConfig
    yuv: bool = False  # 'yuv' in the registry name (embedder.py:108)


def _vqgan_cfg_from_yaml(entry: dict, is_encoder: bool) -> VQGANConfig:
    """Reference ``VAEEncoder(**cfg.encoder)`` / ``VAEDecoder(**cfg.decoder)``
    kwargs -> VQGANConfig. GroupNorm groups are 16 in syncseal's vae.py."""
    return VQGANConfig(
        resolution=int(entry.get("resolution", 256)),
        in_channels=int(entry.get("in_channels", 3)),
        out_channels=1 if entry.get("bw") else int(entry.get("out_ch", 3)),
        ch=int(entry.get("ch", 64)),
        ch_mult=tuple(entry.get("ch_mult", (1, 2, 4, 8))),
        num_res_blocks=int(entry.get("num_res_blocks", 2)),
        attn_resolutions=tuple(entry.get("attn_resolutions", ())),
        z_channels=int(entry.get("z_channels", 4)),
        double_z=bool(entry.get("double_z", False)) if is_encoder else False,
        tanh_out=bool(entry.get("tanh_out", False)) and not is_encoder,
        norm_groups=16,
        dropout=float(entry.get("dropout", 0.0)),
    )


def vae_embedder_config(cfg_yaml: dict, name: str = "vae") -> VAEEmbedderConfig:
    """Build from an embedder.yaml entry with ``encoder:`` / ``decoder:``
    sub-dicts (embedder.py:99-104)."""
    return VAEEmbedderConfig(
        encoder=_vqgan_cfg_from_yaml(cfg_yaml.get("encoder", {}), True),
        decoder=_vqgan_cfg_from_yaml(cfg_yaml.get("decoder", {}), False),
        yuv="yuv" in name,
    )


def vae_embedder_forward(params: dict, cfg: VAEEmbedderConfig,
                         imgs01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] NHWC -> watermark delta prediction (reference VAEEmbedder.forward:
    preprocess to [-1,1], encode, decode)."""
    x = imgs01 * 2.0 - 1.0
    latents = Encoder(cfg.encoder).apply({"params": params["encoder"]}, x)
    return Decoder(cfg.decoder).apply({"params": params["decoder"]}, latents)


def init_vae_embedder_params(seed: int, cfg: VAEEmbedderConfig) -> dict:
    key = jax.random.PRNGKey(seed)
    e = cfg.encoder
    enc_vars = Encoder(e).init(
        key, jnp.zeros((1, e.resolution, e.resolution, e.in_channels)))
    z_in = 2 * e.z_channels if e.double_z else e.z_channels
    d = cfg.decoder
    dec_vars = Decoder(d).init(
        key, jnp.zeros((1, e.codes_per_side, e.codes_per_side, z_in)))
    return {"encoder": jax.tree.map(np.asarray, enc_vars["params"]),
            "decoder": jax.tree.map(np.asarray, dec_vars["params"])}


def convert_vae_embedder(sd, cfg: VAEEmbedderConfig, prefix: str = "") -> dict:
    """Reference VAEEmbedder state dict (``encoder.*``/``decoder.*``) ->
    params (name-based, group count does not change shapes)."""
    from wmar_tpu.utils.convert import (
        _convert_taming_decoder,
        _convert_taming_encoder,
    )

    return {
        "encoder": _convert_taming_encoder(sd, cfg.encoder, prefix + "encoder."),
        "decoder": _convert_taming_decoder(sd, cfg.decoder, prefix + "decoder."),
    }


# ---------------------------------------------------------------------------
# SAM segmentation extractor (extractor.py:70-96)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SegExtractorConfig:
    vit: SAMViTConfig
    upscale_stages: Tuple[int, ...] = (4, 2, 2)
    nparams: int = 8  # output channels = 1 + nparams (PixelDecoder nbits)


def seg_extractor_config(cfg_yaml: dict, img_size: int = 256) -> SegExtractorConfig:
    """Build from an extractor.yaml entry with ``encoder:`` /
    ``pixel_decoder:`` sub-dicts; ``img_size`` is forced by the caller like
    the reference (``extractor.py:104-107`` sets cfg.encoder.img_size)."""
    enc = dict(cfg_yaml.get("encoder", {}))
    pd = dict(cfg_yaml.get("pixel_decoder", {}))
    vit = SAMViTConfig(
        img_size=img_size,
        patch_size=int(enc.get("patch_size", 16)),
        embed_dim=int(enc.get("embed_dim", 768)),
        out_chans=int(enc.get("out_chans", enc.get("embed_dim", 768))),
        depth=int(enc.get("depth", 12)),
        num_heads=int(enc.get("num_heads", 12)),
        mlp_ratio=float(enc.get("mlp_ratio", 4.0)),
        window_size=int(enc.get("window_size", 8)),
        global_attn_indexes=tuple(enc.get("global_attn_indexes", (2, 5, 8, 11))),
    )
    return SegExtractorConfig(
        vit=vit,
        upscale_stages=tuple(pd.get("upscale_stages", (4, 2, 2))),
        nparams=int(pd.get("nbits", 8)),
    )


# sam_tiny: the reference train_sync.py:77 default extractor name; ViT-tiny
# ViTDet geometry (the sam_base row is WAM's released detector geometry).
SAM_TINY = SegExtractorConfig(
    vit=SAMViTConfig(embed_dim=192, out_chans=192, depth=12, num_heads=3))


def seg_extractor_forward(params: dict, cfg: SegExtractorConfig,
                          imgs: jnp.ndarray) -> jnp.ndarray:
    """NHWC images -> [B, H, W, 1+nparams]. NOTE: unlike ConvnextExtractor
    the reference applies NO [0,1]->[-1,1] preprocess here
    (extractor.py:84-96)."""
    feats = sam_encoder(params["vit"], cfg.vit, imgs)
    return pixel_decoder(params["pixel_decoder"], feats)


def init_seg_extractor_params(seed: int, cfg: SegExtractorConfig) -> dict:
    rng = np.random.default_rng(seed)
    return {
        "vit": init_vit_params(rng, cfg.vit),
        "pixel_decoder": init_pixel_decoder_params(
            rng, cfg.vit.out_chans, cfg.upscale_stages, 1 + cfg.nparams),
    }


def convert_seg_extractor(sd, cfg: SegExtractorConfig, prefix: str = "") -> dict:
    """Reference SegmentationExtractor state dict (``image_encoder.*`` /
    ``pixel_decoder.*``) -> params."""
    return {
        "vit": convert_vit(sd, cfg.vit, prefix + "image_encoder."),
        "pixel_decoder": convert_pixel_decoder(
            sd, cfg.upscale_stages, prefix + "pixel_decoder."),
    }
