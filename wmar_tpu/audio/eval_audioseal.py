#!/usr/bin/env python
"""AudioSeal robustness evaluation — counterpart of the reference's
``wmar_audio/evals/eval_audioseal.py:1-232``.

Watermark a directory of audio files with the AudioSeal generator, sweep
the validation augmentation grid, score watermarked vs original clips with
the detector (mean presence probability over time, eval_audioseal.py:
169-172), and report TPR at a target FPR per (augmentation, strength) cell
with original-clip scores pooled as negatives (:62-88).

  python -m wmar_tpu.audio.eval_audioseal --audio_dir audio/ \\
      --output_dir out_audioseal/ --generator_ckpt generator.pth \\
      --detector_ckpt detector.pth --batch_size 4 --nsamples 100

``--tiny`` runs random reduced-width models end-to-end (smoke path; the
scores are meaningless but the full pipeline executes).
"""

from __future__ import annotations

import argparse
import csv
import zlib
import glob
import os
import sys
from collections import defaultdict

import numpy as np


def str2bool(v):
    if isinstance(v, bool):
        return v
    return v.lower() in ("yes", "true", "t", "y", "1")


def get_parser():
    p = argparse.ArgumentParser(description="AudioSeal robustness eval")
    p.add_argument("--audio_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--nsamples", type=int, default=-1)
    p.add_argument("--duration_sec", type=float, default=None)
    p.add_argument("--target_sr", type=int, default=24000)
    p.add_argument("--pad_short_audio", type=str2bool, default=False)
    p.add_argument("--save_audio", type=int, default=0)
    p.add_argument("--eval_aug", type=str2bool, default=True)
    p.add_argument("--generator_ckpt", type=str, default=None,
                   help="audioseal_wm_16bits checkpoint (.pth/.safetensors)")
    p.add_argument("--detector_ckpt", type=str, default=None,
                   help="audioseal_detector_16bits checkpoint")
    p.add_argument("--tiny", action="store_true", help="random tiny models (smoke)")
    p.add_argument("--wm_alpha", type=float, default=1.0)
    p.add_argument("--fpr_target", type=float, default=0.01)
    return p


def load_audio_batch(files, target_sr, duration_sec, pad_short):
    """Load wavs -> [B, T, 1] float32 mono at target_sr, zero-padded to the
    batch max (eval_audioseal.py:110-146)."""
    from scipy.io import wavfile

    wavs = []
    for f in files:
        try:
            sr, data = wavfile.read(f)
        except Exception as e:  # noqa: BLE001 - mirror the reference's skip
            print(f"Error loading {f}: {e}")
            continue
        data = np.asarray(data)
        if data.dtype.kind != "f":
            data = data.astype(np.float32) / 32768.0
        data = data.astype(np.float32)
        if data.ndim == 2:
            data = data.mean(axis=1)
        if sr != target_sr:
            idx = np.linspace(0, len(data) - 1, int(len(data) * target_sr / sr))
            data = np.interp(idx, np.arange(len(data)), data).astype(np.float32)
        if duration_sec is not None:
            n = int(duration_sec * target_sr)
            if len(data) > n:
                data = data[:n]
            elif len(data) < n and pad_short:
                data = np.pad(data, (0, n - len(data)))
        wavs.append(data)
    if not wavs:
        return None
    t = max(len(w) for w in wavs)
    batch = np.zeros((len(wavs), t, 1), np.float32)
    for i, w in enumerate(wavs):
        batch[i, : len(w), 0] = w
    return batch


def tpr_at_fpr(pos_scores, neg_scores, fpr_target=0.01):
    """TPR interpolated at the target FPR on the ROC built from pooled
    scores (mirrors sklearn roc_curve + np.interp, eval_audioseal.py:70-78)."""
    pos = np.asarray(pos_scores, np.float64)
    neg = np.asarray(neg_scores, np.float64)
    scores = np.concatenate([pos, neg])
    labels = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
    order = np.argsort(-scores, kind="stable")
    labels = labels[order]
    tps = np.cumsum(labels)
    fps = np.cumsum(1 - labels)
    tpr = np.concatenate([[0.0], tps / max(tps[-1], 1)])
    fpr = np.concatenate([[0.0], fps / max(fps[-1], 1)])
    return float(np.interp(fpr_target, fpr, tpr))


def _tiny_models():
    from wmar_tpu.audio import audioseal as A

    cfg = A.AudioSealConfig(dimension=16, n_filters=4, ratios=(4, 2), nbits=4,
                            detector_output_dim=8)
    gp, gcfg = A.convert_audioseal_generator(A.synthetic_generator_sd(cfg))
    dp, _ = A.convert_audioseal_detector(A.synthetic_detector_sd(cfg))
    return A.AudioSealModel(gp, dp, gcfg)


def main(argv=None):
    args = get_parser().parse_args(argv)
    from wmar_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from wmar_tpu.audio import audioseal as A
    from wmar_tpu.audio.augmentations import get_validation_augs

    if args.generator_ckpt and args.detector_ckpt:
        model = A.AudioSealModel.from_checkpoints(args.generator_ckpt, args.detector_ckpt)
    elif args.tiny:
        model = _tiny_models()
    else:
        raise SystemExit("need --generator_ckpt + --detector_ckpt, or --tiny")

    exts = ("wav",)  # scipy reads wav; the reference also takes mp3/flac/ogg
    files = sorted(sum((glob.glob(os.path.join(args.audio_dir, f"*.{e}"))
                        for e in exts), []))
    if args.nsamples > 0:
        files = files[: args.nsamples]
    if not files:
        raise SystemExit(f"no audio files in {args.audio_dir}")
    print(f"Processing {len(files)} audio files from {args.audio_dir}")
    os.makedirs(args.output_dir, exist_ok=True)

    if args.eval_aug:
        augs = get_validation_augs(args.target_sr)
    else:
        augs = [("identity", lambda x, p, r: x, [0])]

    results = []
    rng = jax.random.PRNGKey(args.seed)
    for start in range(0, len(files), args.batch_size):
        batch_files = files[start: start + args.batch_size]
        batch = load_audio_batch(batch_files, args.target_sr, args.duration_sec,
                                 args.pad_short_audio)
        if batch is None:
            continue
        orig = jnp.asarray(batch)
        delta = model.get_watermark(orig)
        wm = orig + args.wm_alpha * delta

        for name, fn, strengths in augs:
            for strength in strengths:
                # stable across processes (builtin hash() is PYTHONHASHSEED-salted)
                r = jax.random.fold_in(
                    rng, zlib.crc32(f"{name}/{strength}".encode()) % 2**31)
                aug_wm = fn(wm, strength, r)
                aug_orig = fn(orig, strength, r)
                score_wm = np.asarray(model.detect(aug_wm).mean(axis=1))
                score_orig = np.asarray(model.detect(aug_orig).mean(axis=1))
                for i, f in enumerate(batch_files):
                    gi = start + i
                    results.append({
                        "global_index": gi, "audio_file": f, "aug_name": name,
                        "strength": str(strength),
                        "score_wm": float(score_wm[i]),
                        "score_orig": float(score_orig[i]),
                    })
                    if 0 < args.save_audio and gi < args.save_audio:
                        from scipy.io import wavfile

                        adir = os.path.join(args.output_dir, "audio_samples")
                        os.makedirs(adir, exist_ok=True)
                        wavfile.write(
                            os.path.join(adir, f"{gi:04d}_{name}_{strength}_wm.wav"),
                            args.target_sr,
                            np.clip(np.asarray(aug_wm[i, :, 0]), -1, 1),
                        )
        print(f"batch {start // args.batch_size} done")

    csv_path = os.path.join(args.output_dir, "audioseal_eval_results.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["global_index", "audio_file", "aug_name",
                                          "strength", "score_wm", "score_orig"])
        w.writeheader()
        w.writerows(results)
    print(f"Saved Audioseal evaluation results to {csv_path}")

    negatives = [r["score_orig"] for r in results]
    cells = defaultdict(list)
    for r in results:
        cells[(r["aug_name"], r["strength"])].append(r["score_wm"])
    summary = {}
    for (aug, strength), pos in sorted(cells.items()):
        t = tpr_at_fpr(pos, negatives, args.fpr_target)
        summary[f"{aug}/{strength}"] = t
        print(f"Aug: {aug}, Strength: {strength}")
        print(f"TPR at FPR={args.fpr_target}: {t:.4f}")
    return results, summary


if __name__ == "__main__":
    main(sys.argv[1:])
