"""Reference-grammar yaml configs for SyncSeal training.

The reference's ``train_sync.py:59-82`` consumes four yaml files; the
loaders in ``wmar_tpu/sync/configs.py`` must parse the exact files the
reference ships (``syncseal/configs/*.yaml``) and steer the trainer.
"""

import os
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.sync import configs as C
from wmar_tpu.sync import syncseal_models as sm

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_CFG = "/root/reference/syncseal/configs"


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference not mounted")
def test_loads_reference_yamls():
    unet = C.load_embedder_config(os.path.join(REF_CFG, "embedder.yaml"))
    # embedder.yaml selects unet_small2_yuv_quant -> the quantizable variant
    assert (unet.activation, unet.normalization) == ("relu", "batch")
    assert unet.z_channels == 16 and unet.z_channels_mults == (1, 2, 4, 8)

    cn = C.load_extractor_config(os.path.join(REF_CFG, "extractor.yaml"))
    assert cn.depths == (3, 3, 9, 3) and cn.dims == (96, 192, 384, 768)
    assert cn.out_dim == 8

    assert C.load_attenuation_config(os.path.join(REF_CFG, "attenuation.yaml")) == (1, 1)
    with pytest.raises(NotImplementedError):
        C.load_attenuation_config(os.path.join(REF_CFG, "attenuation.yaml"), "jnd_3_3")

    aw = C.load_augs_config(os.path.join(REF_CFG, "all_augs.yaml"))
    # all_augs.yaml: median_filter and hue have weight 0
    vm = dict(zip(C._VALUEMETRIC_NAMES, aw.valuemetric))
    assert vm["median_filter"] == 0.0 and vm["hue"] == 0.0
    assert vm["identity"] > vm["jpeg"] > 0  # identity weight 2, jpeg 1 split over 2 branches
    assert abs(sum(aw.valuemetric) - 1.0) < 1e-9
    assert abs(sum(aw.geometric) - 1.0) < 1e-9


def test_quantizable_unet_forward():
    cfg = sm.UNetConfig(z_channels=4, num_blocks=1, z_channels_mults=(1, 2),
                        norm_groups=2, activation="relu", normalization="batch")
    params = sm.init_unet_params(0, cfg)
    y = sm.unet_forward(params, cfg, jnp.zeros((2, 16, 16, 1)) + 0.3)
    assert y.shape == (2, 16, 16, 1)
    assert np.isfinite(np.asarray(y)).all()
    # batch norm actually engaged: output differs from the group-norm variant
    y_gn = sm.unet_forward(params, sm.UNetConfig(
        z_channels=4, num_blocks=1, z_channels_mults=(1, 2), norm_groups=2),
        jnp.zeros((2, 16, 16, 1)) + 0.3)
    assert not np.allclose(np.asarray(y), np.asarray(y_gn))


def test_weighted_geo_sampler_respects_zero_weight():
    from wmar_tpu.sync.syncseal import TV_CORNERS, sample_geometric_corners

    # weight only 'identity': every sample must be the canonical corners
    probs = (1.0, 0.0, 0.0, 0.0, 0.0)
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    out = jax.vmap(lambda k: sample_geometric_corners(k, probs=probs))(keys)
    np.testing.assert_allclose(np.asarray(out),
                               np.tile(np.asarray(TV_CORNERS), (64, 1, 1)), atol=1e-6)


def test_dataset_config(tmp_path):
    y = tmp_path / "ds.yaml"
    y.write_text("train_dir: /data/train\nval_dir: /data/val\n"
                 "train_annotation_file: null\n")
    d = C.load_dataset_config(str(y))
    assert d["train_dir"] == "/data/train"
    with pytest.raises(ValueError):
        y2 = tmp_path / "bad.yaml"
        y2.write_text("val_dir: /x\n")
        C.load_dataset_config(str(y2))


def test_train_cli_with_yaml_configs(tmp_path):
    cfgdir = tmp_path / "cfg"
    cfgdir.mkdir()
    (cfgdir / "embedder.yaml").write_text(textwrap.dedent("""\
        model: tiny
        tiny:
          z_channels: 4
          num_blocks: 1
          z_channels_mults: [1, 2]
          activation: relu
          normalization: batch
          last_tanh: True
    """))
    (cfgdir / "augs.yaml").write_text(textwrap.dedent("""\
        augs:
          identity: 2
          crop: 1
          jpeg: 1
          brightness: 1
    """))
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "train_syncseal.py"),
         "--output_dir", str(tmp_path / "run"), "--synthetic", "true",
         "--tiny", "--epochs", "1", "--steps_per_epoch", "2",
         "--batch_size", "2", "--img_size", "32", "--eval_freq", "100",
         "--lambda_i", "0",
         "--embedder_config", str(cfgdir / "embedder.yaml"),
         "--augmentation_config", str(cfgdir / "augs.yaml")],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-3000:]
    # configs copied into the run dir like the reference (train_sync.py:197-201)
    assert (tmp_path / "run" / "configs" / "embedder.yaml").exists()
    assert (tmp_path / "run" / "configs" / "augs.yaml").exists()
    assert (tmp_path / "run" / "log.jsonl").exists()
