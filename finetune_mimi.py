#!/usr/bin/env python
"""Mimi RCC finetune CLI (TPU-native).

Counterpart of the reference's ``wmar_audio/training/finetune_mimi.py``
(argparse surface :590-662, train loop :145-262, eval loop :264-372,
checkpointing :568-588): finetune the Mimi encoder/decoder so that
decode -> (augment) -> re-encode reproduces the original tokens, with the
reference's loss bank (mrstft / multi-mel / SI-SNR / TF-loudness audio
losses; mse/l1 code losses against pre_q / post_q / per-layer targets),
AdamW + warmup-cosine schedule, JSON-configured train augmentations with an
``augmentation_start`` epoch, full-state auto-resume, per-epoch weight
deltas (the published artifact format, ``training/apply_deltas.py``), and a
per-eval validation: losses + per-codebook idempotence + SISNR/SNR/STOI
(+PESQ when the package exists) + sample wav dumps + an optional
validation-aug token-match sweep (``evals/token_match.py``).

Data parallelism is a JAX device mesh (all local devices) instead of DDP.
Datasets: ``--audio_dir`` of .wav/.npy clips, or ``--synthetic N`` random
band-limited clips (smoke/CI).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np


def get_parser():
    p = argparse.ArgumentParser(description="Fine-tune the Mimi encoder-decoder model")
    p.add_argument("--mimi_weights", type=str, default=None,
                   help="converted Mimi msgpack (tools/convert: kyutai "
                        "tokenizer-*.safetensors); omit with --tiny")
    p.add_argument("--tiny", action="store_true", help="random tiny Mimi (smoke)")
    p.add_argument("--output_dir", type=str, default="output")
    # Dataset
    p.add_argument("--audio_dir", type=str, default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic clips instead of --audio_dir")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--target_sr", type=int, default=24000)
    p.add_argument("--target_duration", type=float, default=10.0,
                   help="clip seconds; must be a multiple of the Mimi frame (80 ms)")
    p.add_argument("--num_valid", type=int, default=100)
    # Training
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--warmup_epochs", type=int, default=5)
    p.add_argument("--steps_per_epoch", type=int, default=100)
    # Losses
    p.add_argument("--code_loss_type", type=str, default="mse")
    p.add_argument("--audio_loss_type", type=str, default="mrstft")
    p.add_argument("--audio_loss_weight", type=float, default=1e-3)
    p.add_argument("--code_loss_weight", type=float, default=1.0)
    p.add_argument("--audio_target_type", type=str, default="replica",
                   choices=["replica", "original"])
    p.add_argument("--code_target_type", type=str, default="pre_q",
                   help="'pre_q', 'post_q', or layer indices ('0-2,5')")
    # Finetuning-specific
    p.add_argument("--resume_from", type=str, default=None,
                   help="checkpoint to initialize the model from")
    p.add_argument("--finetune_encoder", type=lambda s: s.lower() in ("1", "true", "yes"),
                   default=True)
    # Misc
    p.add_argument("--save_freq", type=int, default=10)
    p.add_argument("--eval_freq", type=int, default=1)
    p.add_argument("--seed", type=int, default=42424242)
    p.add_argument("--val_token_match", type=str, default="subset",
                   choices=["none", "subset", "full"],
                   help="per-eval decode->aug->encode token-match sweep")
    # Augmentations
    p.add_argument("--augmentation_start", type=int, default=-1,
                   help="epoch to start applying augmentations; -1 = never")
    p.add_argument("--augs", type=str, default="{}",
                   help="JSON dict of augmentation weights")
    p.add_argument("--augs_params", type=str, default="{}",
                   help="JSON dict of augmentation parameters")
    p.add_argument("--num_augmentations", type=int, default=1)
    return p


def build_mimi(args):
    import jax
    import jax.numpy as jnp

    from wmar_tpu.audio import Mimi, MimiConfig
    from wmar_tpu.audio.mimi import MIMI_V0_1
    from wmar_tpu.utils import checkpoint as ckpt

    if args.tiny:
        cfg = MimiConfig(
            dimension=32, n_filters=8, ratios=(4, 2), n_residual_layers=1,
            n_q=4, n_q_semantic=1, cardinality=32, codebook_dim=8,
            transformer_layers=1, transformer_heads=2, downsample=1,
        )
        model = Mimi(cfg)
        audio = jnp.zeros((1, cfg.hop_length * 4, 1))
        variables = model.init(jax.random.PRNGKey(0), audio)
        return model, variables
    assert args.mimi_weights, "--mimi_weights or --tiny required"
    cfg = MIMI_V0_1
    model = Mimi(cfg)
    like = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.hop_length * 4, 1))))
    variables = ckpt.load_pytree(
        args.mimi_weights, jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), like))
    return model, variables


def synthetic_clips(n: int, length: int, seed: int) -> np.ndarray:
    """Band-limited random audio [N, T, 1] in [-1, 1]."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, length)).astype(np.float32)
    spec = np.fft.rfft(x, axis=-1)
    spec[:, spec.shape[1] // 6 :] = 0.0  # lowpass for realistic spectra
    x = np.fft.irfft(spec, n=length, axis=-1).astype(np.float32)
    x /= np.abs(x).max(axis=-1, keepdims=True) + 1e-9
    return (0.5 * x)[..., None]


def main(argv=None):
    args = get_parser().parse_args(argv)
    from wmar_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from wmar_tpu.audio import augmentations as VA
    from wmar_tpu.audio.augmenter import Augmenter
    from wmar_tpu.audio.dataloader import AudioDataset, train_valid_split
    from wmar_tpu.audio.finetune import (
        MimiFTState,
        MimiFTWrapper,
        make_rcc_eval_step,
        make_rcc_train_step,
        validation_token_match,
    )
    from wmar_tpu.audio.losses import get_audio_loss, get_code_loss
    from wmar_tpu.audio.prompts import write_wav
    from wmar_tpu.parallel import make_mesh, shard_batch
    from wmar_tpu.utils import checkpoint as ckpt
    from wmar_tpu.utils.metrics import pesq_metric, sisnr, snr, stoi

    # the reference's clutils quirk: single quotes allowed in the JSON flags
    augs = json.loads(args.augs.replace("'", '"'))
    augs_params = json.loads(args.augs_params.replace("'", '"'))
    assert (args.target_duration * 1000) % 80 == 0, \
        "Target duration should be a multiple of 80ms (s/frame of mimi)."

    os.makedirs(args.output_dir, exist_ok=True)
    model, variables = build_mimi(args)
    wrapper = MimiFTWrapper(model, variables)
    clip_len = int(args.target_sr * args.target_duration) if not args.tiny \
        else model.cfg.hop_length * 8

    # ----- data ------------------------------------------------------------
    if args.synthetic:
        clips = synthetic_clips(args.synthetic, clip_len, args.seed)
        tr_idx, va_idx = train_valid_split(
            len(clips), min(args.num_valid, len(clips) - 1), args.seed)
        get_batch = lambda idx: clips[np.asarray(idx)]  # noqa: E731
    else:
        assert args.audio_dir, "--audio_dir or --synthetic required"
        ds = AudioDataset(args.audio_dir, args.target_sr,
                          clip_len / args.target_sr)
        tr_idx, va_idx = train_valid_split(
            len(ds), min(args.num_valid, len(ds) - 1), args.seed)
        get_batch = lambda idx: np.stack([ds[int(i)] for i in idx])  # noqa: E731
    print(f"Dataset split: Train={len(tr_idx)}, Valid={len(va_idx)}")

    n_dev = jax.local_device_count()
    mesh = make_mesh(dp=n_dev, tp=1)
    bs = max(n_dev, (args.batch_size // n_dev) * n_dev)
    if bs != args.batch_size:
        print(f"batch_size {args.batch_size} -> {bs} (divisible by {n_dev} devices)")

    # ----- optimizer: AdamW + warmup-cosine to 1e-2 (optim.py:17-60) -------
    warmup_steps = args.warmup_epochs * args.steps_per_epoch
    total_steps = max(args.epochs * args.steps_per_epoch, warmup_steps + 1)
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=args.learning_rate,
        warmup_steps=max(warmup_steps, 1), decay_steps=total_steps,
        end_value=args.learning_rate * 1e-2)
    inner = optax.adamw(schedule)
    if args.finetune_encoder:
        optimizer = inner
    else:
        # decoder-only finetune (finetune_mimi.py:443-449)
        label = lambda tree: {k: ("train" if k.startswith("dec") else "freeze")  # noqa: E731
                              for k in tree}
        optimizer = optax.multi_transform(
            {"train": inner, "freeze": optax.set_to_zero()}, label)

    trainable0 = wrapper.init_trainable()
    orig_trainable = jax.tree.map(np.asarray, trainable0)
    state = MimiFTState(jnp.zeros((), jnp.int32), trainable0,
                        optimizer.init(trainable0))

    if args.resume_from:
        state = dataclasses.replace(
            state, trainable=ckpt.load_pytree(args.resume_from, state.trainable))

    # full-state auto-resume (restart_from_checkpoint, finetune_mimi.py:516-529)
    start_epoch = 0
    resume_path = os.path.join(args.output_dir, "checkpoint.msgpack")
    meta_path = os.path.join(args.output_dir, "checkpoint_meta.json")
    if os.path.exists(resume_path) and os.path.exists(meta_path):
        state = ckpt.load_pytree(resume_path, state)
        with open(meta_path) as f:
            start_epoch = json.load(f)["epoch"]
        print(f"resumed from {resume_path} at epoch {start_epoch}")

    # ----- augmenter + losses ----------------------------------------------
    augmenter = Augmenter(augs, augs_params, args.num_augmentations,
                          args.target_sr) if augs else None
    audio_loss_fn = get_audio_loss(args.audio_loss_type, args.target_sr)
    code_loss_fn = get_code_loss(args.code_loss_type)

    step_plain = jax.jit(make_rcc_train_step(
        wrapper, optimizer, audio_loss_fn, code_loss_fn,
        args.audio_loss_weight, args.code_loss_weight, None,
        args.audio_target_type, args.code_target_type))
    step_aug = jax.jit(make_rcc_train_step(
        wrapper, optimizer, audio_loss_fn, code_loss_fn,
        args.audio_loss_weight, args.code_loss_weight,
        augmenter, args.audio_target_type, args.code_target_type)) \
        if augmenter else step_plain
    eval_step = jax.jit(make_rcc_eval_step(
        wrapper, audio_loss_fn, code_loss_fn, None,
        args.audio_target_type, args.code_target_type))

    # token-match sweep augs (a light slice of the eval grid)
    tm_augs = []
    if args.val_token_match != "none":
        grid = VA.get_validation_augs(args.target_sr)
        names = {"identity", "noise", "lowpass", "smooth"} \
            if args.val_token_match == "subset" else None
        for name, fn, params in grid:
            if names is None or name in names:
                tm_augs.append((name, fn, params if names is None else params[:1]))

    def run_eval(epoch, trainable):
        stats, cnt = {}, 0
        first = True
        for s in range(0, len(va_idx), bs):
            vb = get_batch(va_idx[s : s + bs])
            rows = vb.shape[0]
            if rows < bs:
                vb = np.concatenate([vb] * (-(-bs // rows)))[:bs]
            batch = shard_batch(mesh, jnp.asarray(vb))
            m, recon, pred = eval_step(trainable, batch,
                                       jax.random.PRNGKey(args.seed + epoch))
            recon, pred = np.asarray(recon), np.asarray(pred)
            m = {k: float(v) for k, v in m.items()}
            m["sisnr"] = sisnr(pred[:rows], recon[:rows])
            m["snr"] = snr(pred[:rows], recon[:rows])
            m["stoi"] = float(np.mean([
                stoi(pred[i, :, 0], recon[i, :, 0], args.target_sr)
                for i in range(rows)]))
            pq = pesq_metric(pred[0, :, 0], recon[0, :, 0], args.target_sr)
            if pq is not None:
                m["pesq"] = float(pq)
            for k, v in m.items():
                stats[k] = stats.get(k, 0.0) + v * rows
            cnt += rows
            if first:  # sample wav dumps (finetune_mimi.py:349-359)
                write_wav(os.path.join(args.output_dir, f"{epoch:03d}_target.wav"),
                          recon[0, :, 0], args.target_sr)
                write_wav(os.path.join(args.output_dir, f"{epoch:03d}_pred.wav"),
                          pred[0, :, 0], args.target_sr)
                first = False
        stats = {k: v / max(cnt, 1) for k, v in stats.items()}
        # token-match sweep (evals/token_match.py counterpart)
        for name, fn, params in tm_augs:
            for prm in params:
                vb = get_batch(va_idx[: max(1, min(bs, len(va_idx)))])
                if vb.shape[0] < bs:
                    vb = np.concatenate([vb] * (-(-bs // vb.shape[0])))[:bs]
                tm = validation_token_match(
                    wrapper, trainable, model.apply(
                        wrapper._vars(), jnp.asarray(vb), method=model.encode),
                    aug_fn=lambda x, r, fn=fn, prm=prm: fn(x, prm, r),
                    rng=jax.random.PRNGKey(args.seed))
                stats[f"token_match_{name}_{prm}"] = float(np.mean(np.asarray(tm)))
        return stats

    # ----- training loop ----------------------------------------------------
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    with jax.set_mesh(mesh):
        for epoch in range(start_epoch, args.epochs):
            print(f"Epoch {epoch}/{args.epochs}")
            use_aug = augmenter is not None and args.augmentation_start >= 0 \
                and epoch >= args.augmentation_start
            step_fn = step_aug if use_aug else step_plain
            acc, cnt = {}, 0
            for bi in range(args.steps_per_epoch):
                idx = rng.choice(tr_idx, size=bs, replace=len(tr_idx) < bs)
                batch = shard_batch(mesh, jnp.asarray(get_batch(idx)))
                key = jax.random.PRNGKey(args.seed + epoch * 100000 + bi)
                state, metrics = step_fn(state, batch, key)
                if bi % 10 == 0 or bi == args.steps_per_epoch - 1:
                    m = {k: round(float(v), 6) for k, v in metrics.items()}
                    m["lr"] = float(schedule(int(state.step)))
                    print(f"Epoch: [{epoch}] [{bi}/{args.steps_per_epoch}] {m}")
                for k, v in metrics.items():
                    acc[k] = acc.get(k, 0.0) + float(v)
                cnt += 1
            train_logs = {k: v / cnt for k, v in acc.items()}
            train_logs["epoch"] = epoch

            if (epoch + 1) % args.eval_freq == 0:
                eval_logs = run_eval(epoch, state.trainable)
                print(f"Eval Epoch: [{epoch}] "
                      + json.dumps({k: round(v, 5) for k, v in eval_logs.items()}))
                train_logs.update({f"eval_{k}": v for k, v in eval_logs.items()})

            with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
                f.write(json.dumps(train_logs) + "\n")

            # full-state checkpoint + per-epoch deltas (the published format)
            ckpt.save_pytree(resume_path, state)
            with open(meta_path, "w") as f:
                json.dump({"epoch": epoch + 1}, f)
            for part in state.trainable:
                ckpt.save_delta(
                    os.path.join(args.output_dir, f"epoch{epoch}_{part}_delta.msgpack"),
                    state.trainable[part], orig_trainable[part])
            if (epoch + 1) % args.save_freq == 0:
                ckpt.save_pytree(
                    os.path.join(args.output_dir, f"checkpoint{epoch:03d}.msgpack"),
                    state)
    print(f"Training completed. Elapsed time: {(time.time() - t0) / 3600:.2f} hours.")
    return state


if __name__ == "__main__":
    main(sys.argv[1:])
