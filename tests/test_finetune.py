"""RCC finetune: loss sanity, masks, data-parallel step over the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from wmar_tpu.finetune import (
    MaskGitRCCAdapter,
    RCCConfig,
    TamingRCCAdapter,
    apply_random_augmentation,
    expand_level,
    init_state,
    make_optimizer,
    make_train_step,
    validation_l0,
)
from wmar_tpu.finetune.rcc import _branch_logits, _latent_mask
from wmar_tpu.models import MaskGitVQConfig, MaskGitVQGAN, TamingVQGAN, VQGANConfig
from wmar_tpu.parallel import make_mesh, shard_batch

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"

TINY_VQ = VQGANConfig(
    resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(),
    z_channels=32, n_embed=64, embed_dim=16,
)


@pytest.fixture(scope="module")
def adapter():
    model = TamingVQGAN(TINY_VQ)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    return TamingRCCAdapter(model, variables)


def test_expand_level_counts():
    weak = expand_level("weak")
    assert len(weak) == 3 + 2 + 4 + 3 + 2 + 2
    assert expand_level("warmup") == []
    logits = _branch_logits("weak")
    np.testing.assert_allclose(np.exp(logits).sum(), 1.0, rtol=1e-5)


def test_latent_masks():
    rot = [b for b in expand_level("medium") if b.mask_kind == "rotate"][0]
    m = _latent_mask(rot, 16)
    assert m[0, 0] == 0.0 and m[8, 8] == 1.0
    crop = [b for b in expand_level("medium") if b.mask_kind == "croppad" and b.param == 0.5][0]
    m = _latent_mask(crop, 16)
    assert m[:8, :8].min() == 1.0 and m[8:, :].max() == 0.0


def test_apply_random_augmentation_gate():
    x = jnp.full((2, 32, 32, 3), 0.5)
    branches = expand_level("weak")
    logits = _branch_logits("weak")
    # p=0 -> identity
    out, mask = apply_random_augmentation(x, branches, logits, 16, jax.random.PRNGKey(0), p=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(mask), 1.0)
    # p=1 -> something happens for most keys
    changed = 0
    for s in range(8):
        out, _ = apply_random_augmentation(x, branches, logits, 16, jax.random.PRNGKey(s), p=1.0)
        changed += int(not np.allclose(np.asarray(out), 0.5, atol=1e-4))
    assert changed >= 4


def test_train_step_reduces_idem_loss(adapter):
    cfg = RCCConfig(lr=3e-4, idem_weight=2.0)
    opt = make_optimizer(cfg)
    step = jax.jit(make_train_step(adapter, cfg, "warmup", opt))
    state = init_state(adapter, opt)
    codes = jnp.asarray(np.random.default_rng(0).integers(0, 64, size=(4, 256)))
    first = None
    for i in range(8):
        state, metrics = step(state, codes, jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics["idem"])
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["idem"]) < first  # idempotence improves on fixed batch
    assert int(state.step) == 8


def test_train_step_with_augs_runs(adapter):
    cfg = RCCConfig(lr=1e-4)
    opt = make_optimizer(cfg)
    step = jax.jit(make_train_step(adapter, cfg, "weak", opt))
    state = init_state(adapter, opt)
    codes = jnp.asarray(np.random.default_rng(1).integers(0, 64, size=(2, 256)))
    state, metrics = step(state, codes, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_train_step_data_parallel(adapter):
    """Batch sharded over the 8-device CPU mesh == single-device result."""
    mesh = make_mesh(dp=8, tp=1)
    cfg = RCCConfig(lr=1e-4)
    opt = make_optimizer(cfg)
    step_fn = make_train_step(adapter, cfg, "warmup", opt)
    state = init_state(adapter, opt)
    codes = jnp.asarray(np.random.default_rng(2).integers(0, 64, size=(8, 256)))

    sharded_codes = shard_batch(mesh, codes)
    with jax.set_mesh(mesh):
        jstep = jax.jit(step_fn)
        state_dp, m_dp = jstep(state, sharded_codes, jax.random.PRNGKey(0))
    state_1, m_1 = jax.jit(step_fn)(state, codes, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_1["loss"]), rtol=1e-4)
    l_dp = jax.tree.leaves(state_dp.trainable)[0]
    l_1 = jax.tree.leaves(state_1.trainable)[0]
    np.testing.assert_allclose(np.asarray(l_dp), np.asarray(l_1), rtol=1e-3, atol=1e-5)


def test_validation_l0(adapter):
    trainable = adapter.init_trainable()
    codes = jnp.asarray(np.random.default_rng(3).integers(0, 64, size=(2, 256)))
    l0 = np.asarray(validation_l0(adapter, trainable, codes))
    assert l0.shape == (2,)
    assert ((l0 >= 0) & (l0 <= 1)).all()


def test_maskgit_adapter_roundtrip():
    cfg = MaskGitVQConfig(
        resolution=16, hidden_channels=32, channel_mult=(1, 2), num_res_blocks=1,
        z_channels=16, n_embed=32, embed_dim=16,
    )
    model = MaskGitVQGAN(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    adapter = MaskGitRCCAdapter(model, variables)
    opt = make_optimizer(RCCConfig(lr=1e-4))
    step = jax.jit(make_train_step(adapter, RCCConfig(lr=1e-4), "warmup", opt))
    state = init_state(adapter, opt)
    codes = jnp.asarray(np.random.default_rng(4).integers(0, 32, size=(2, 64)))
    state, metrics = step(state, codes, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_finetune_cli_resume(tmp_path):
    """Interrupt-and-resume continues from the saved epoch."""
    import finetune

    common = ["--tiny", "--synthetic", "8", "--augs", "none",
              "--batch_size_per_device", "2", "--lr", "1e-4",
              "--outdir", str(tmp_path), "--log_every", "100"]
    finetune.main(common + ["--nb_epochs", "1"])
    assert (tmp_path / "checkpoint.msgpack").exists()
    state = finetune.main(common + ["--nb_epochs", "2", "--resume"])
    import json as _json

    meta = _json.loads((tmp_path / "checkpoint_meta.json").read_text())
    assert meta["next_epoch"] == 2
    # one epoch ran before resume, one after (steps/epoch depends on the
    # device count, so assert epochs via the meta + monotone step count)
    assert int(state.step) >= 2


def test_finetune_cli_validation(tmp_path):
    """The CLI runs the reference-style per-epoch validation sweep
    (finetune.py:73-128,388-392): history.json carries per-cell stats
    (loss/idem/l0) and ENC/DEC drift, per epoch plus a final sweep."""
    import json as _json

    import finetune

    finetune.main([
        "--tiny", "--synthetic", "10", "--augs", "none",
        "--batch_size_per_device", "2", "--lr", "1e-4",
        "--outdir", str(tmp_path), "--log_every", "100",
        "--nb_epochs", "2", "--val_percent", "0.2", "--val_batches", "1",
    ])
    hist = _json.loads((tmp_path / "history.json").read_text())["epochs"]
    # 2 train epochs + 1 final validation entry
    assert len(hist) == 3 and hist[-1]["level"] == "final"
    for entry in hist:
        val = entry["validation"]
        assert "Identity_0" in val and "drift" in val
        cell = val["Identity_0"]
        for k in ("loss", "idem_loss", "vqgan_loss", "l0"):
            assert np.isfinite(cell[k])
        assert 0.0 <= cell["l0"] <= 1.0
        assert val["drift"]["enc"] >= 0.0 and val["drift"]["dec"] >= 0.0
    # training logs now include the reference's ENC/DEC drift monitors
    m = hist[0]["metrics"][0]
    assert "enc_dist" in m and "dec_dist" in m
