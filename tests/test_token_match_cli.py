"""Standalone token_match CLI (reference wmar_audio/evals/token_match.py).

Covers: compute_tm semantics (equal/unequal lengths, per-channel), the mimi
decode->encode roundtrip mode over a directory of wav files, and the moshi
generation mode — both with tiny random models and CSV output.
"""

import csv
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from wmar_tpu.audio.token_match import compute_tm, main  # noqa: E402


def test_compute_tm_equal_lengths():
    a = np.arange(24).reshape(1, 2, 12)
    assert compute_tm(a, a) == 1.0
    b = a.copy()
    b[0, 0, :6] += 1  # 6 of 24 positions differ
    assert abs(compute_tm(a, b) - 0.75) < 1e-9
    per = compute_tm(a, b, per_channel=True)
    assert abs(per[0] - 0.5) < 1e-9 and per[1] == 1.0


def test_compute_tm_unequal_lengths_prefix_and_roll():
    a = np.arange(20).reshape(1, 1, 20)
    b = a[..., :15]
    # per-channel: shift-0 prefix comparison only (reference :73)
    assert compute_tm(a, b, per_channel=True) == [1.0]
    # flat: best cyclic shift (reference :92-97) recovers a rolled copy
    rolled = np.roll(a, 3, axis=-1)
    assert compute_tm(rolled, b) == 1.0


def _write_wavs(d, n=2, seconds=1.0, sr=24000):
    from scipy.io import wavfile

    rng = np.random.default_rng(0)
    for i in range(n):
        x = (rng.standard_normal(int(sr * seconds)) * 0.1 * 32767).astype(np.int16)
        wavfile.write(os.path.join(d, f"clip{i}.wav"), sr, x)


def test_mimi_mode_tiny(tmp_path):
    wav_dir = tmp_path / "wavs"
    out_dir = tmp_path / "out"
    os.makedirs(wav_dir)
    _write_wavs(str(wav_dir))
    results = main([
        "--mode", "mimi", "--tiny",
        "--audio_dir", str(wav_dir),
        "--output_dir", str(out_dir),
        "--duration_sec", "0.5",
        "--batch_size", "2",
        "--eval_aug", "false",
        "--save_audio", "1",
        "--save_tokens", "1",
    ])
    assert results and all(0.0 <= r["tm_rate"] <= 1.0 for r in results)
    # identity roundtrip through the SAME tiny mimi: decode->encode is not
    # the identity for random weights, but rates must be populated per stream
    assert any(k.startswith("tm_rate_") for k in results[0])
    csv_path = out_dir / "token_match_results.csv"
    assert csv_path.exists()
    rows = list(csv.DictReader(open(csv_path)))
    assert len(rows) == len(results)
    assert {r["aug"] for r in rows} == {"identity"}
    assert (out_dir / "audio").exists()
    assert list(out_dir.glob("identity_*.npz"))


def test_mimi_mode_identity_weights_match(tmp_path):
    """With --mimi_weight_ori == --mimi_weight the first encode and the
    re-encode share weights, so an un-augmented roundtrip must score the
    tokens the codec itself reproduces (sanity: rate equals the direct
    recompute)."""
    import jax
    import jax.numpy as jnp

    from wmar_tpu.audio import Mimi, MimiConfig

    wav_dir = tmp_path / "wavs"
    os.makedirs(wav_dir)
    _write_wavs(str(wav_dir), n=1)
    out = main([
        "--mode", "mimi", "--tiny",
        "--audio_dir", str(wav_dir),
        "--output_dir", str(tmp_path / "out"),
        "--duration_sec", "0.5",
        "--eval_aug", "false",
        "--save_audio", "0",
    ])
    cfg = MimiConfig(
        dimension=64, n_filters=8, ratios=(4, 2), n_residual_layers=1,
        n_q=4, n_q_semantic=1, cardinality=64, codebook_dim=16,
        transformer_layers=1, transformer_heads=2, downsample=2,
    )
    mimi = Mimi(cfg)
    params = mimi.init(jax.random.PRNGKey(1), jnp.zeros((1, cfg.hop_length * 4, 1)))
    from wmar_tpu.audio.dataloader import AudioDataset

    ds = AudioDataset(str(wav_dir), target_sr=24000,
                      target_duration=0.5, cache_dir=None)
    pcm = ds[0][None]
    toks = mimi.apply(params, pcm, method=Mimi.encode)
    re = mimi.apply(params, mimi.apply(params, toks, method=Mimi.decode),
                    method=Mimi.encode)
    expect = float((np.asarray(toks) == np.asarray(re)).mean())
    assert abs(out[0]["tm_rate"] - expect) < 1e-6


def test_moshi_mode_tiny(tmp_path):
    out_dir = tmp_path / "out"
    results = main([
        "--mode", "moshi", "--tiny",
        "--output_dir", str(out_dir),
        "--steps", "8",
        "--batch_size", "1",
        "--eval_aug", "false",
        "--save_audio", "0",
    ])
    assert results
    assert all(0.0 <= r["tm_rate"] <= 1.0 for r in results)
    assert (out_dir / "token_match_results.csv").exists()
