#!/usr/bin/env python
"""Audio watermark evaluation: generate -> decode -> attack -> re-encode -> detect.

Counterpart of the reference's ``wmar_audio/evals/main_wm.py``: stream
tokens from the Moshi-style LM with the Maryland/Gumbel watermark fused into
sampling, decode to waveform with Mimi, sweep the audio attack bank,
re-tokenize, and score greenlist hits per stream with binomial p-values.

``--tiny`` runs randomly-initialized models end-to-end (smoke/CI path);
real weights load from converted checkpoints via --moshi_weight/--mimi_weight.
"""

from __future__ import annotations

import argparse
import json
import zlib
import os
import sys

import numpy as np


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--moshi_weight", type=str, default=None)
    p.add_argument("--mimi_weight", type=str, default=None)
    p.add_argument("--steps", type=int, default=64, help="frames to generate (12.5 fps)")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--wm_method", type=str, default="maryland", choices=["maryland", "gumbel", "none"])
    p.add_argument("--wm_streams", type=str, default="0,1,2,3,4,5,6,7,8")
    p.add_argument("--wm_ngram", type=int, default=0)
    p.add_argument("--wm_delta", type=float, default=4.0)
    p.add_argument("--wm_gamma", type=float, default=0.25)
    p.add_argument("--wm_seed", type=int, default=0)
    p.add_argument("--weight_dtype", type=str, default=None, choices=["int8"],
                   help="weight-only int8 on the Moshi temporal backbone + "
                        "text head (per-output-channel absmax; 7B MOSHI_V01: "
                        "14 GB bf16 -> 7 GB, fits one v5e). Not token-exact")
    p.add_argument("--cache_dtype", type=str, default=None,
                   choices=["f32", "bf16", "int8", "packed", "packed4"],
                   help="temporal KV-cache dtype; int8 halves the dominant "
                        "cache reads (+65%% frames/s), packed adds the "
                        "batch-blocked Pallas decode kernel (+29%% on int8, "
                        "PERFORMANCE.md). Not token-exact vs f32")
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--top_k", type=int, default=250)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no_augs", action="store_true")
    p.add_argument("--encodec_weight", type=str, default=None,
                   help="EnCodec 24k checkpoint for the codec-compression attack")
    p.add_argument("--dac_weight", type=str, default=None,
                   help="DAC 24k checkpoint for the codec-compression attack")
    p.add_argument("--mimi_compression", action="store_true",
                   help="add a Mimi round-trip codec attack (uses the loaded Mimi)")
    # reference main_wm.py surface: audio prompts, artifact dumps, filters
    p.add_argument("--use_prompts", action="store_true",
                   help="teacher-force generation with Mimi-encoded audio prompts")
    p.add_argument("--audio_dir", type=str, default=None,
                   help="directory of .wav prompt files (with --use_prompts)")
    p.add_argument("--nsamples", type=int, default=0,
                   help="cap the number of prompt files (0 = batch_size)")
    p.add_argument("--duration_sec", type=float, default=5.0,
                   help="crop/pad prompts to this length")
    p.add_argument("--eval_aug", type=str, default=None,
                   help="restrict the sweep to one augmentation family")
    p.add_argument("--save_audio", action="store_true",
                   help="write generated waveforms as .wav into output_dir")
    p.add_argument("--save_tokens", action="store_true",
                   help="write generated token streams as .npy into output_dir")
    p.add_argument("--mimi_weight_ori", type=str, default=None,
                   help="ORIGINAL (non-finetuned) Mimi for re-encode/detection "
                        "(main_wm.py:107: generation may use finetuned weights)")
    # synchronization watermark (main_wm.py:127-130,243-270)
    p.add_argument("--wm_sync", action="store_true",
                   help="gate an AudioSeal watermark with the square-wave "
                        "sync pattern and invert speed/shift before re-encode")
    p.add_argument("--sync_generator_ckpt", type=str, default=None,
                   help="audioseal_wm_16bits checkpoint (random tiny with --tiny)")
    p.add_argument("--sync_detector_ckpt", type=str, default=None,
                   help="audioseal_detector_16bits checkpoint")
    p.add_argument("--sync_alpha", type=float, default=0.5,
                   help="sync watermark strength (main_wm.py:245)")
    return p


def _build_sync_pattern(args, mimi_cfg):
    """AudioSeal-backed SyncPattern (reference watermark/sync.py:16-31)."""
    from wmar_tpu.audio import audioseal as aseal
    from wmar_tpu.audio.sync import SyncPattern

    if args.sync_generator_ckpt and args.sync_detector_ckpt:
        model = aseal.AudioSealModel.from_checkpoints(
            args.sync_generator_ckpt, args.sync_detector_ckpt)
        return SyncPattern(model)
    if not args.tiny:
        raise SystemExit("--wm_sync needs --sync_generator_ckpt + "
                         "--sync_detector_ckpt (or --tiny)")
    cfg = aseal.AudioSealConfig(
        dimension=16, n_filters=4, ratios=(4, 2), nbits=4,
        detector_output_dim=8, sample_rate=24000)
    gp, gcfg = aseal.convert_audioseal_generator(aseal.synthetic_generator_sd(cfg))
    dp, _ = aseal.convert_audioseal_detector(aseal.synthetic_detector_sd(cfg))
    model = aseal.AudioSealModel(gp, dp, gcfg)
    # tiny clips: shrink the sync period so several cycles fit
    return SyncPattern(model, frames_per_period=2, frame_size=mimi_cfg.hop_length)


def _load_prompt_codes(args, mimi, mimi_params, moshi_cfg):
    """Encode .wav prompts through Mimi into teacher-forcing codes
    (main_wm.py:136-151). Returns [B, K, T'] or None."""
    import glob as _glob

    import jax.numpy as jnp
    from scipy.io import wavfile

    files = sorted(_glob.glob(os.path.join(args.audio_dir, "*.wav")))
    if not files:
        print(f"No audio files found in {args.audio_dir}. Proceeding without prompts.")
        return None
    n = args.nsamples if args.nsamples > 0 else args.batch_size
    files = files[: min(n, args.batch_size)]
    target = int(args.duration_sec * 24000)
    wavs = []
    for f in files:
        sr, data = wavfile.read(f)
        data = np.asarray(data, np.float32)
        if data.dtype.kind != "f":
            data = data / 32768.0
        elif np.abs(data).max() > 1.5:
            data = data / 32768.0
        if data.ndim == 2:
            data = data.mean(axis=1)
        if sr != 24000:  # linear resample to the Mimi rate
            idx = np.linspace(0, len(data) - 1, int(len(data) * 24000 / sr))
            data = np.interp(idx, np.arange(len(data)), data).astype(np.float32)
        data = data[:target]
        if len(data) < target:
            data = np.pad(data, (0, target - len(data)))
        wavs.append(data)
    while len(wavs) < args.batch_size:  # pad the batch with silence
        wavs.append(np.zeros(target, np.float32))
    from wmar_tpu.audio import Mimi

    batch = jnp.asarray(np.stack(wavs))[:, :, None]
    codes = np.asarray(mimi.apply(mimi_params, batch, method=Mimi.encode))
    print(f"Using {len(files)} audio files as prompts ({codes.shape[2]} frames)")
    return jnp.asarray(codes)


def main(argv=None):
    args = get_parser().parse_args(argv)
    from wmar_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from wmar_tpu.audio import (
        Mimi,
        MimiConfig,
        MoshiConfig,
        MoshiGen,
        WMConfig,
        gumbel_score,
        init_moshi_params,
        pvalue_gumbel,
        pvalue_maryland,
        score_stream_maryland,
        window_hash,
    )
    from wmar_tpu.audio.augmentations import get_validation_augs

    if args.tiny:
        moshi_cfg = MoshiConfig(
            n_audio_streams=4, audio_vocab=64, text_vocab=64,
            dim=64, n_layers=2, n_heads=2, dep_dim=32, dep_layers=1, dep_heads=2,
            delays=(0, 1, 1, 1),
        )
        mimi_cfg = MimiConfig(
            dimension=64, n_filters=8, ratios=(4, 2), n_residual_layers=1,
            n_q=4, n_q_semantic=1, cardinality=64, codebook_dim=16,
            transformer_layers=1, transformer_heads=2, downsample=2,
        )
        moshi_params = init_moshi_params(jax.random.PRNGKey(0), moshi_cfg)
        mimi = Mimi(mimi_cfg)
        mimi_params = mimi.init(jax.random.PRNGKey(1), jnp.zeros((1, mimi_cfg.hop_length * 4, 1)))
    else:
        from wmar_tpu.audio.lm import MOSHI_V01
        from wmar_tpu.audio.mimi import MIMI_V0_1, convert_mimi
        from wmar_tpu.utils import checkpoint as _ckpt
        from wmar_tpu.utils.convert import convert_moshi_lm, load_torch_state_dict

        if not (args.moshi_weight and args.mimi_weight):
            raise SystemExit(
                "full-size eval needs --moshi_weight (model.safetensors) and "
                "--mimi_weight (tokenizer-*.safetensors), or use --tiny"
            )
        moshi_cfg, mimi_cfg = MOSHI_V01, MIMI_V0_1
        mimi = Mimi(mimi_cfg)
        if args.mimi_weight.endswith(".msgpack"):
            like = mimi.init(jax.random.PRNGKey(0), jnp.zeros((1, mimi_cfg.hop_length * 2, 1)))
            mimi_params = _ckpt.load_pytree(args.mimi_weight, like)
        else:
            mimi_params = jax.tree.map(
                jnp.asarray, convert_mimi(load_torch_state_dict(args.mimi_weight), mimi_cfg)
            )
        if args.moshi_weight.endswith(".msgpack"):
            like = init_moshi_params(jax.random.PRNGKey(0), moshi_cfg)
            moshi_params = _ckpt.load_pytree(args.moshi_weight, like)
        else:
            moshi_params = jax.tree.map(
                jnp.asarray,
                convert_moshi_lm(load_torch_state_dict(args.moshi_weight), moshi_cfg),
            )

    streams = tuple(int(s) for s in args.wm_streams.split(","))
    wm = None
    if args.wm_method != "none":
        wm = WMConfig(
            method=args.wm_method, streams=streams, ngram=args.wm_ngram,
            delta=args.wm_delta, gamma=args.wm_gamma, seed=args.wm_seed,
            temp=args.temperature, top_k=args.top_k,
        )
    if args.weight_dtype == "int8":
        from wmar_tpu.audio.lm import quantize_moshi_params_int8

        moshi_params = quantize_moshi_params_int8(
            moshi_params, compute_dtype=None if args.tiny else jnp.bfloat16)
    cache_dtype = {None: jnp.float32, "f32": jnp.float32, "bf16": jnp.bfloat16,
                   "int8": jnp.int8, "packed": "packed",
                   "packed4": "packed4"}[args.cache_dtype]
    gen = MoshiGen(moshi_params, moshi_cfg, wm, cache_dtype=cache_dtype)
    prompt_codes = None
    if args.use_prompts and args.audio_dir:
        prompt_codes = _load_prompt_codes(args, mimi, mimi_params, moshi_cfg)
        if prompt_codes is not None:
            prompt_codes = prompt_codes[:, : moshi_cfg.n_audio_streams]
    text, audio_codes = gen.generate(
        args.steps, jax.random.PRNGKey(args.seed), batch=args.batch_size,
        prompt_codes=prompt_codes,
    )

    # Decode to waveform, attack, re-encode, score. Detection may use the
    # ORIGINAL Mimi while generation used finetuned weights (main_wm.py:107).
    pcm = mimi.apply(mimi_params, audio_codes, method=Mimi.decode)
    sync_pattern = None
    if args.wm_sync:
        sync_pattern = _build_sync_pattern(args, mimi_cfg)
        pcm = sync_pattern.get_sync_wm(pcm, alpha=args.sync_alpha)  # main_wm.py:245
    det_params = mimi_params
    if args.mimi_weight_ori:
        from wmar_tpu.utils import checkpoint as _ckpt2

        if args.mimi_weight_ori.endswith(".msgpack"):
            like = mimi.init(jax.random.PRNGKey(0), jnp.zeros((1, mimi_cfg.hop_length * 2, 1)))
            det_params = _ckpt2.load_pytree(args.mimi_weight_ori, like)
        else:
            from wmar_tpu.audio.mimi import convert_mimi as _cm
            from wmar_tpu.utils.convert import load_torch_state_dict as _ltsd

            det_params = jax.tree.map(jnp.asarray, _cm(_ltsd(args.mimi_weight_ori), mimi_cfg))

    os.makedirs(args.output_dir, exist_ok=True)
    if args.save_audio:
        from scipy.io import wavfile as _wavfile

        for b in range(args.batch_size):
            _wavfile.write(
                os.path.join(args.output_dir, f"gen_{b:03d}.wav"), 24000,
                np.clip(np.asarray(pcm[b, :, 0]), -1, 1),
            )
    if args.save_tokens:
        np.save(os.path.join(args.output_dir, "text_tokens.npy"), np.asarray(text))
        np.save(os.path.join(args.output_dir, "audio_tokens.npy"), np.asarray(audio_codes))
    if args.no_augs:
        augs = [("identity", lambda x, p, r: x, [0])]
    else:
        codec_kw = {}
        if args.mimi_compression:
            from wmar_tpu.audio.augmentations import MimiCompression

            codec_kw["mimi_codec"] = MimiCompression(mimi, mimi_params)
        if args.encodec_weight:
            from wmar_tpu.audio.codecs import CodecCompression

            codec_kw["encodec"] = CodecCompression.from_checkpoint(
                "encodec", args.encodec_weight
            )
        if args.dac_weight:
            from wmar_tpu.audio.codecs import CodecCompression

            codec_kw["dac"] = CodecCompression.from_checkpoint("dac", args.dac_weight)
        augs = get_validation_augs(**codec_kw)
        if args.eval_aug:
            augs = [(n, f, ps) for n, f, ps in augs if n == args.eval_aug or n == "identity"]
            if len(augs) <= 1:
                raise SystemExit(f"--eval_aug {args.eval_aug!r} not in the grid")

    records = []
    from wmar_tpu.utils.metrics import pesq_metric, sisnr, stoi

    for name, fn, params in augs:
        for param in params:
            # zlib.crc32, not builtin hash(): str hashing is salted per
            # process (PYTHONHASHSEED), which would make the attack RNG —
            # and therefore every stored p-value — irreproducible across runs
            attacked = fn(pcm, param, jax.random.fold_in(
                jax.random.PRNGKey(args.seed), zlib.crc32(name.encode()) % 2**31))
            sync_scores = [None] * args.batch_size
            if sync_pattern is not None:
                # Detect the sync signal, and when it is ambiguous
                # (|mean - 0.5| < 0.25) estimate speed/shift and invert
                # before re-encoding (main_wm.py:258-270).
                det_sig = sync_pattern.detect_signal(attacked)
                rows = []
                for b in range(args.batch_size):
                    row = attacked[b:b + 1]
                    score = float(det_sig[b].mean())
                    sync_scores[b] = score
                    if abs(score - 0.5) < 0.25:
                        speedup, shift = sync_pattern.get_speedup_and_shift(det_sig[b])
                        row = sync_pattern.invert(row, speedup, shift)
                        print(f"sync: {name}/{param} b={b} score={score:.3f} "
                              f"speedup={speedup:.3f} shift={shift}")
                    rows.append(np.asarray(mimi.apply(det_params, row, method=Mimi.encode)))
                tmin = min(r.shape[2] for r in rows)
                re_codes = jnp.asarray(np.concatenate([r[:, :, :tmin] for r in rows], axis=0))
            else:
                re_codes = mimi.apply(det_params, attacked, method=Mimi.encode)
            quality = [
                {
                    "sisnr": sisnr(attacked[b, : pcm.shape[1]], pcm[b]),
                    "stoi": stoi(attacked[b, : pcm.shape[1]], pcm[b], fs=24000),
                    "pesq": pesq_metric(attacked[b, : pcm.shape[1]], pcm[b], fs=24000),
                }
                for b in range(args.batch_size)
            ]
            # ngram=0 hashes depend only on position count; attacks that
            # change duration (speed, crop, sync-invert) change the
            # re-encoded frame count, so build them per re-encode length.
            fixed_hashes = window_hash(
                jnp.zeros((re_codes.shape[2], 0), jnp.int32), args.wm_seed)
            for b in range(args.batch_size):
                for s in range(min(moshi_cfg.n_audio_streams, re_codes.shape[1])):
                    hashes_s = fixed_hashes[: re_codes.shape[2]]
                    if args.wm_method == "maryland" and (s + 1) in streams:
                        ng, ns = score_stream_maryland(
                            re_codes[b, s], hashes_s, args.wm_gamma, salt=0
                        )
                        pval = float(pvalue_maryland(ng, ns, args.wm_gamma))
                    elif args.wm_method == "gumbel" and (s + 1) in streams:
                        scores = gumbel_score(re_codes[b, s], hashes_s)
                        n = re_codes.shape[2]
                        pval = float(pvalue_gumbel(scores.sum(), jnp.int32(n)))
                    else:
                        pval = None
                    tl = min(re_codes.shape[2], audio_codes.shape[2])
                    tm = float((re_codes[b, s][:tl] == audio_codes[b, s][:tl]).mean())
                    rec = {
                        "aug": name, "param": param, "batch": b, "stream": s,
                        "pvalue": pval, "token_match": tm, **quality[b],
                    }
                    if sync_scores[b] is not None:
                        rec["sync_score"] = sync_scores[b]
                    records.append(rec)
        print(f"aug {name} done")

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "results.json"), "w") as f:
        json.dump(records, f, indent=1)
    print(f"wrote {len(records)} records")
    return records


if __name__ == "__main__":
    main(sys.argv[1:])
