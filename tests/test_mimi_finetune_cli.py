"""Mimi RCC finetune CLI + its dataloader/augmenter/train-step stack.

Counterpart coverage for the reference's ``wmar_audio/training/``:
``finetune_mimi.py`` (CLI surface, resume, deltas, eval logs),
``dataloader.py`` (file discovery/crop/pad/split), ``augmenter.py``
(weighted aug bank), ``mimi_ft_wrapper.py`` (RCC forward pipeline).
"""

import json
import os
import wave

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from wmar_tpu.audio import Mimi, MimiConfig
from wmar_tpu.audio.augmenter import Augmenter
from wmar_tpu.audio.dataloader import AudioDataset, train_valid_split
from wmar_tpu.audio.finetune import (
    MimiFTState,
    MimiFTWrapper,
    make_rcc_eval_step,
    make_rcc_train_step,
    parse_code_target_indices,
    rcc_forward,
)
from wmar_tpu.audio.losses import MRSTFTLoss, get_code_loss

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"

TINY = MimiConfig(
    dimension=32, n_filters=8, ratios=(4, 2), n_residual_layers=1,
    n_q=4, n_q_semantic=1, cardinality=16, codebook_dim=8,
    transformer_layers=1, transformer_heads=2, downsample=1,
)


@pytest.fixture(scope="module")
def wrapper():
    model = Mimi(TINY)
    audio = jnp.zeros((1, TINY.hop_length * 8, 1))
    variables = model.init(jax.random.PRNGKey(0), audio)
    return MimiFTWrapper(model, variables)


# ---------------------------------------------------------------------------
# parse_code_target_indices (finetune_mimi.py:113-143)
# ---------------------------------------------------------------------------


def test_parse_code_target_indices():
    assert parse_code_target_indices("pre_q") is None
    assert parse_code_target_indices("post_q") is None
    assert parse_code_target_indices("0") == [0]
    assert parse_code_target_indices("013") == [0, 1, 3]
    assert parse_code_target_indices("0-2,5") == [0, 1, 2, 5]
    with pytest.raises(ValueError):
        parse_code_target_indices("3-1")
    with pytest.raises(ValueError):
        parse_code_target_indices("abc")


# ---------------------------------------------------------------------------
# dataloader
# ---------------------------------------------------------------------------


def _write_wav(path, x, sr):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())


def test_audio_dataset_wav_npy(tmp_path):
    sr = 24000
    rng = np.random.default_rng(0)
    long = 0.4 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
    short = rng.uniform(-0.3, 0.3, size=sr // 4).astype(np.float32)
    _write_wav(tmp_path / "a.wav", long, sr)
    np.save(tmp_path / "b.npy", short)
    (tmp_path / "sub").mkdir()
    _write_wav(tmp_path / "sub" / "c.wav", long[: sr // 2], sr)

    ds = AudioDataset(str(tmp_path), target_sr=sr, target_duration=0.5,
                      cache_dir=None)
    assert len(ds) == 3
    for i in range(3):
        clip = ds[i]
        assert clip.shape == (sr // 2, 1)
        assert clip.dtype == np.float32
    # wav roundtrip is faithful (first file sorts first: a.wav)
    np.testing.assert_allclose(ds[0][:, 0], long[: sr // 2], atol=2e-4)
    # short clip zero-padded
    b = ds[1][:, 0]
    assert np.all(b[sr // 4 :] == 0.0)

    batches = list(ds.batches([0, 1, 2], batch_size=2))
    assert batches[0].shape == (2, sr // 2, 1)
    assert batches[1].shape == (1, sr // 2, 1)


def test_audio_dataset_resample(tmp_path):
    sr_in, sr_out = 16000, 24000
    t = np.arange(sr_in) / sr_in
    x = 0.5 * np.sin(2 * np.pi * 200 * t).astype(np.float32)
    _write_wav(tmp_path / "a.wav", x, sr_in)
    ds = AudioDataset(str(tmp_path), target_sr=sr_out, target_duration=0.5,
                      cache_dir=None)
    y = ds[0][:, 0]
    t2 = np.arange(sr_out // 2) / sr_out
    ref = 0.5 * np.sin(2 * np.pi * 200 * t2)
    # interior matches the analytic resample (edges differ: spectral method)
    err = np.abs(y[200:-200] - ref[200:-200]).max()
    assert err < 0.02


def test_train_valid_split_deterministic():
    tr, va = train_valid_split(100, 10, seed=7)
    tr2, va2 = train_valid_split(100, 10, seed=7)
    np.testing.assert_array_equal(tr, tr2)
    np.testing.assert_array_equal(va, va2)
    assert len(va) == 10 and len(tr) == 90
    assert not set(tr) & set(va)
    with pytest.raises(ValueError):
        train_valid_split(5, 5, seed=0)


# ---------------------------------------------------------------------------
# augmenter
# ---------------------------------------------------------------------------


def test_augmenter_selection_and_shapes(rng):
    aug = Augmenter({"identity": 1, "noise_injection": 1, "lowpass_filter": 1},
                    num_augs=2, sample_rate=24000, n_levels=2)
    audio = jnp.asarray(rng.uniform(-0.5, 0.5, size=(2, 512, 1)).astype(np.float32))
    fn = jax.jit(aug)
    out, picked = fn(audio, jax.random.PRNGKey(3))
    assert out.shape == audio.shape
    assert picked.shape == (2,)
    assert np.isfinite(np.asarray(out)).all()
    # identity weight 0 never selected
    aug2 = Augmenter({"identity": 0, "noise_injection": 1}, sample_rate=24000)
    hits = set()
    for i in range(8):
        _, p = aug2(audio, jax.random.PRNGKey(i))
        hits.add(aug2.labels[int(p[0])].split("_")[0])
    assert hits == {"noise"}


def test_augmenter_unknown_aug():
    with pytest.raises(ValueError, match="not found"):
        Augmenter({"nonexistent": 1})


def test_augmenter_empty_defaults_identity(rng):
    aug = Augmenter({})
    audio = jnp.asarray(rng.uniform(-0.5, 0.5, size=(1, 64, 1)).astype(np.float32))
    out, _ = aug(audio, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(audio))


# ---------------------------------------------------------------------------
# RCC forward/train step (mimi_ft_wrapper.py:49-80, finetune_mimi.py:145-262)
# ---------------------------------------------------------------------------


def test_rcc_forward_shapes(wrapper):
    audio = jnp.asarray(np.random.default_rng(0).uniform(
        -0.5, 0.5, size=(2, TINY.hop_length * 8, 1)).astype(np.float32))
    out = rcc_forward(wrapper, wrapper.init_trainable(), audio)
    frames = 8  # T / hop_length
    assert out["codes"].shape == (2, TINY.n_q, frames)
    assert out["recons_codes"].shape == (2, TINY.n_q, frames)
    assert out["all_pre_q"].shape == (TINY.n_q, 2, frames, TINY.codebook_dim)
    assert out["all_post_q"].shape == (TINY.n_q, 2, frames, TINY.codebook_dim)
    assert out["audio_recon"].shape == audio.shape
    # at init the trainable decoder equals the frozen replica
    np.testing.assert_allclose(np.asarray(out["audio_recon_pred"]),
                               np.asarray(out["audio_recon"]), atol=1e-5)


@pytest.mark.parametrize("code_target", ["pre_q", "post_q", "0-1"])
def test_rcc_train_step_finite_at_init(wrapper, code_target):
    """Regression: mrstft's spectral-convergence norm must not emit NaN
    gradients when pred == target exactly (true at init)."""
    opt = optax.adam(1e-4)
    step = jax.jit(make_rcc_train_step(
        wrapper, opt, MRSTFTLoss(), get_code_loss("mse"), 1e-3, 1.0,
        None, "replica", code_target))
    t0 = wrapper.init_trainable()
    state = MimiFTState(jnp.zeros((), jnp.int32), t0, opt.init(t0))
    audio = jnp.asarray(np.random.default_rng(1).uniform(
        -0.5, 0.5, size=(2, TINY.hop_length * 8, 1)).astype(np.float32))
    for i in range(2):
        state, metrics = step(state, audio, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"])), (code_target, i)
    leaves = jax.tree.leaves(state.trainable)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)
    assert {"loss", "audio_loss", "code_loss", "idemp_0"} <= set(metrics)


def test_rcc_train_step_improves_code_loss(wrapper):
    opt = optax.adam(3e-4)
    step = jax.jit(make_rcc_train_step(
        wrapper, opt, MRSTFTLoss(), get_code_loss("mse"), 0.0, 1.0))
    t0 = wrapper.init_trainable()
    state = MimiFTState(jnp.zeros((), jnp.int32), t0, opt.init(t0))
    audio = jnp.asarray(np.random.default_rng(2).uniform(
        -0.5, 0.5, size=(2, TINY.hop_length * 8, 1)).astype(np.float32))
    first = None
    for i in range(8):
        state, metrics = step(state, audio, jax.random.PRNGKey(0))
        if first is None:
            first = float(metrics["code_loss"])
    assert float(metrics["code_loss"]) < first


def test_rcc_eval_step_returns_recons(wrapper):
    eval_step = jax.jit(make_rcc_eval_step(
        wrapper, MRSTFTLoss(), get_code_loss("mse")))
    audio = jnp.asarray(np.random.default_rng(3).uniform(
        -0.5, 0.5, size=(1, TINY.hop_length * 8, 1)).astype(np.float32))
    metrics, recon, pred = eval_step(wrapper.init_trainable(), audio,
                                     jax.random.PRNGKey(0))
    assert recon.shape == audio.shape and pred.shape == audio.shape
    assert "loss" not in metrics and "code_loss" in metrics


# ---------------------------------------------------------------------------
# CLI end-to-end (finetune_mimi.py)
# ---------------------------------------------------------------------------


def test_cli_synthetic_end_to_end(tmp_path):
    import finetune_mimi

    out = tmp_path / "run"
    argv = ["--tiny", "--synthetic", "6", "--batch_size", "2", "--epochs", "2",
            "--steps_per_epoch", "2", "--num_valid", "2", "--warmup_epochs", "1",
            "--output_dir", str(out), "--val_token_match", "none",
            "--augs", "{'identity': 1, 'noise_injection': 1}",
            "--augmentation_start", "1"]
    finetune_mimi.main(argv)

    logs = [json.loads(line) for line in open(out / "log.txt")]
    assert len(logs) == 2
    assert {"loss", "audio_loss", "code_loss", "epoch",
            "eval_code_loss", "eval_sisnr"} <= set(logs[0])
    assert all(np.isfinite(v) for lg in logs
               for v in lg.values() if isinstance(v, float))
    # per-epoch deltas in the published format, per trainable part
    for epoch in (0, 1):
        for part in ("encoder", "decoder", "enc_transformer", "dec_transformer"):
            assert (out / f"epoch{epoch}_{part}_delta.msgpack").exists()
    assert (out / "000_pred.wav").exists() and (out / "000_target.wav").exists()

    # auto-resume: meta says epoch 2 of 2 -> second call is a no-op
    meta = json.load(open(out / "checkpoint_meta.json"))
    assert meta["epoch"] == 2
    n_logs = len(open(out / "log.txt").readlines())
    finetune_mimi.main(argv)
    assert len(open(out / "log.txt").readlines()) == n_logs

    # resume continues: bump epochs to 3, exactly one more epoch is run
    argv3 = list(argv)
    argv3[argv3.index("--epochs") + 1] = "3"
    finetune_mimi.main(argv3)
    logs = [json.loads(line) for line in open(out / "log.txt")]
    assert [lg["epoch"] for lg in logs] == [0, 1, 2]
