"""SyncSeal model-zoo variants: yaml registry dispatch + forward shapes.

Counterpart of the reference registries in
``syncseal/syncseal/models/embedder.py:99-110`` (vae*/unet*) and
``extractor.py:99-110`` (convnext*/sam*): every registry name must load from
yaml and run. Parity against the actual reference modules lives in
``tests/test_reference_module_oracle.py`` (slow tier).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from wmar_tpu.sync import syncseal_zoo as zoo  # noqa: E402
from wmar_tpu.sync.configs import load_embedder_config, load_extractor_config  # noqa: E402

yaml = pytest.importorskip("yaml")


def _write_yaml(path, d):
    with open(path, "w") as f:
        yaml.safe_dump(d, f)
    return str(path)


def test_embedder_yaml_vae_dispatch(tmp_path):
    p = _write_yaml(tmp_path / "embedder.yaml", {
        "model": "vae_small",
        "vae_small": {
            "encoder": {"ch": 16, "ch_mult": [1, 2], "num_res_blocks": 1,
                        "attn_resolutions": [], "resolution": 32,
                        "z_channels": 4, "double_z": False},
            "decoder": {"ch": 16, "ch_mult": [1, 2], "num_res_blocks": 1,
                        "attn_resolutions": [], "resolution": 32,
                        "z_channels": 4, "tanh_out": True},
        },
    })
    cfg = load_embedder_config(p)
    assert isinstance(cfg, zoo.VAEEmbedderConfig)
    assert not cfg.yuv
    assert cfg.encoder.norm_groups == 16 and cfg.decoder.tanh_out

    params = zoo.init_vae_embedder_params(0, cfg)
    out = zoo.vae_embedder_forward(
        jax.tree.map(jnp.asarray, params), cfg, jnp.zeros((2, 32, 32, 3)))
    assert out.shape == (2, 32, 32, 3)
    assert np.all(np.abs(np.asarray(out)) <= 1.0)  # tanh_out


def test_embedder_yaml_vae_yuv_flag(tmp_path):
    p = _write_yaml(tmp_path / "embedder.yaml", {
        "model": "vae_yuv",
        "vae_yuv": {
            "encoder": {"ch": 16, "ch_mult": [1, 2], "num_res_blocks": 1,
                        "attn_resolutions": [], "resolution": 32,
                        "in_channels": 1, "z_channels": 4},
            "decoder": {"ch": 16, "ch_mult": [1, 2], "num_res_blocks": 1,
                        "attn_resolutions": [], "resolution": 32,
                        "out_ch": 1, "z_channels": 4},
        },
    })
    cfg = load_embedder_config(p)
    assert cfg.yuv  # 'yuv' in name => YUV luminance-only (embedder.py:108)
    assert cfg.encoder.in_channels == 1 and cfg.decoder.out_channels == 1


def test_extractor_yaml_sam_dispatch(tmp_path):
    p = _write_yaml(tmp_path / "extractor.yaml", {
        "model": "sam_tiny",
        "sam_tiny": {
            "encoder": {"patch_size": 8, "embed_dim": 16, "out_chans": 16,
                        "depth": 2, "num_heads": 2, "window_size": 2,
                        "global_attn_indexes": [1]},
            "pixel_decoder": {"upscale_stages": [2, 2, 2], "nbits": 8},
        },
    })
    cfg = load_extractor_config(p, img_size=32)
    assert isinstance(cfg, zoo.SegExtractorConfig)
    assert cfg.vit.img_size == 32  # forced by caller (extractor.py:104-107)

    params = zoo.init_seg_extractor_params(0, cfg)
    out = zoo.seg_extractor_forward(
        jax.tree.map(jnp.asarray, params), cfg, jnp.zeros((1, 32, 32, 3)))
    # patch 8 -> grid 4, upscales 2*2*2 -> back to 32; channels = 1 + nparams
    assert out.shape == (1, 32, 32, 9)


def test_unknown_registry_names_still_raise(tmp_path):
    pe = _write_yaml(tmp_path / "e.yaml", {"model": "mlp_embedder",
                                           "mlp_embedder": {"hidden": 4}})
    with pytest.raises(NotImplementedError):
        load_embedder_config(pe)
    px = _write_yaml(tmp_path / "x.yaml", {"model": "resnet_extractor",
                                           "resnet_extractor": {"layers": 3}})
    with pytest.raises(NotImplementedError):
        load_extractor_config(px)


def test_convert_roundtrip_shapes():
    """Converter output must be pytree-identical in shape to init params
    (the shape contract the real-checkpoint path relies on)."""
    cfg = zoo.SegExtractorConfig(
        vit=zoo.SAMViTConfig(img_size=16, patch_size=8, embed_dim=8, out_chans=8,
                             depth=1, num_heads=2, window_size=2,
                             global_attn_indexes=(0,)),
        upscale_stages=(2, 2, 2), nparams=8)
    init = zoo.init_seg_extractor_params(0, cfg)

    sd = {}
    v = init["vit"]
    sd["image_encoder.patch_embed.proj.weight"] = np.transpose(
        v["patch_embed"]["kernel"], (3, 2, 0, 1))
    sd["image_encoder.patch_embed.proj.bias"] = v["patch_embed"]["bias"]
    sd["image_encoder.pos_embed"] = v["pos_embed"]
    for i, blk in enumerate(v["blocks"]):
        p = f"image_encoder.blocks.{i}."
        sd[p + "norm1.weight"] = blk["norm1"]["scale"]
        sd[p + "norm1.bias"] = blk["norm1"]["bias"]
        sd[p + "norm2.weight"] = blk["norm2"]["scale"]
        sd[p + "norm2.bias"] = blk["norm2"]["bias"]
        sd[p + "attn.qkv.weight"] = blk["attn"]["qkv"]["w"].T
        sd[p + "attn.qkv.bias"] = blk["attn"]["qkv"]["b"]
        sd[p + "attn.proj.weight"] = blk["attn"]["proj"]["w"].T
        sd[p + "attn.proj.bias"] = blk["attn"]["proj"]["b"]
        sd[p + "attn.rel_pos_h"] = blk["attn"]["rel_pos_h"]
        sd[p + "attn.rel_pos_w"] = blk["attn"]["rel_pos_w"]
        sd[p + "mlp.lin1.weight"] = blk["mlp_lin1"]["w"].T
        sd[p + "mlp.lin1.bias"] = blk["mlp_lin1"]["b"]
        sd[p + "mlp.lin2.weight"] = blk["mlp_lin2"]["w"].T
        sd[p + "mlp.lin2.bias"] = blk["mlp_lin2"]["b"]
    sd["image_encoder.neck.0.weight"] = np.transpose(v["neck0"]["kernel"], (3, 2, 0, 1))
    sd["image_encoder.neck.1.weight"] = v["neck1"]["scale"]
    sd["image_encoder.neck.1.bias"] = v["neck1"]["bias"]
    sd["image_encoder.neck.2.weight"] = np.transpose(v["neck2"]["kernel"], (3, 2, 0, 1))
    sd["image_encoder.neck.3.weight"] = v["neck3"]["scale"]
    sd["image_encoder.neck.3.bias"] = v["neck3"]["bias"]
    for si, stage in enumerate(init["pixel_decoder"][:-1]):
        p = f"pixel_decoder.output_upscaling.{si}.upsample_block."
        sd[p + "2.weight"] = np.transpose(stage["conv"]["kernel"], (3, 2, 0, 1))
        sd[p + "3.weight"] = stage["ln"]["scale"]
        sd[p + "3.bias"] = stage["ln"]["bias"]
    last = init["pixel_decoder"][-1]
    sd["pixel_decoder.last_layer.weight"] = np.transpose(last["kernel"], (3, 2, 0, 1))
    sd["pixel_decoder.last_layer.bias"] = last["bias"]

    conv = zoo.convert_seg_extractor(sd, cfg)
    ref_shapes = jax.tree.map(lambda a: np.shape(a), init)
    got_shapes = jax.tree.map(lambda a: np.shape(a), conv)
    assert ref_shapes == got_shapes
    got = zoo.seg_extractor_forward(
        jax.tree.map(jnp.asarray, conv), cfg, jnp.ones((1, 16, 16, 3)))
    want = zoo.seg_extractor_forward(
        jax.tree.map(jnp.asarray, init), cfg, jnp.ones((1, 16, 16, 3)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
