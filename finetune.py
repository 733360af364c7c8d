#!/usr/bin/env python
"""RCC tokenizer finetuning CLI (TPU-native).

Counterpart of the reference's ``finetune.py``: train a cloned
watermark_encoder + decoder so decode->attack->encode round-trips preserve
tokens. Data parallelism is a device mesh (all local devices by default)
instead of DDP; the aug curriculum (``--augs_schedule 1,1,4,4`` =
warmup/weak/medium/strong epochs) and the delta checkpoint format are
preserved.

Dataset: a directory of per-sample ``.npy`` token files (the reference's
``CodesOnDiskDataset``, produced by ``precompute_imagenet_codes.py``) or one
``.npy`` of shape [N, T]. ``--synthetic N`` trains on random codes (smoke).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, choices=["taming", "rar", "chameleon7b"], default="taming")
    p.add_argument("--modelpath", type=str, default=None)
    p.add_argument("--datapath", type=str, default=None)
    p.add_argument("--dataset_size", type=int, default=None)
    p.add_argument("--synthetic", type=int, default=0, help="train on N random code rows (smoke)")
    p.add_argument("--tiny", action="store_true", help="random tiny tokenizer (smoke)")
    p.add_argument("--mode", type=str, default="newenc-dec")
    p.add_argument("--nb_epochs", type=int, default=10)
    p.add_argument("--augs", type=str, choices=["none", "all+geom"], default="all+geom")
    p.add_argument("--augs_schedule", type=str, default="1,1,4,4")
    p.add_argument("--optimizer", type=str, default="adam")
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--batch_size_per_device", type=int, default=4)
    p.add_argument("--dataset", type=str, default="codes-imagenet",
                   help="dataset kind; only codes-imagenet exists, like the "
                        "reference (finetune.py:198-203)")
    p.add_argument("--idempotence_loss_weight", type=float, default=2.0)
    p.add_argument("--idempotence_loss_weight_factor", type=float, default=1.0,
                   help="geometric per-epoch schedule: idem weight is "
                        "multiplied by this after every epoch (reference "
                        "finetune.py:502-506)")
    p.add_argument("--loss", type=str, default="hard-to-soft-with-ae")
    p.add_argument("--disable_gan", action="store_true",
                   help="skip the generator-side GAN branch (all six "
                        "published reference sweeps pass this)")
    p.add_argument("--disc_ckpt", type=str, default=None,
                   help="discriminator.msgpack (emitted by convert_ckpt "
                        "taming); default: <modelpath>/discriminator.msgpack")
    p.add_argument("--disc_init", type=str, choices=["ckpt", "random"],
                   default="ckpt",
                   help="'random': fresh weights_init discriminator when no "
                        "checkpoint is available (tiny/synthetic smoke)")
    p.add_argument("--disc_start", type=int, default=0)
    p.add_argument("--disc_factor", type=float, default=1.0)
    p.add_argument("--disc_weight", type=float, default=1.0)
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--lpips_weights", type=str, default=None)
    p.add_argument("--resume", action="store_true",
                   help="auto-resume from <outdir>/checkpoint.msgpack")
    p.add_argument("--val_percent", type=float, default=0.05,
                   help="held-out fraction for the per-epoch validation "
                        "(reference finetune.py:196)")
    p.add_argument("--val_batches", type=int, default=0,
                   help="cap validation batches per (aug,param) cell (0 = all)")
    p.add_argument("--no_validate", action="store_true",
                   help="skip the per-epoch validation sweep")
    return p


def load_codes(args, vocab: int, tokens: int) -> np.ndarray:
    if args.synthetic:
        rng = np.random.default_rng(args.seed)
        return rng.integers(0, vocab, size=(args.synthetic, tokens)).astype(np.int32)
    assert args.datapath, "--datapath or --synthetic required"
    if os.path.isdir(args.datapath):
        files = sorted(glob.glob(os.path.join(args.datapath, "**/*.npy"), recursive=True))
        if args.dataset_size:
            files = files[: args.dataset_size]
        return np.stack([np.load(f).reshape(-1) for f in files]).astype(np.int32)
    data = np.load(args.datapath).astype(np.int32)
    return data[: args.dataset_size] if args.dataset_size else data


def build_adapter(args):
    import jax
    import jax.numpy as jnp

    from wmar_tpu.finetune import MaskGitRCCAdapter, TamingRCCAdapter
    from wmar_tpu.models import (
        MASKGIT_IMAGENET_F16,
        MaskGitVQConfig,
        MaskGitVQGAN,
        TAMING_IMAGENET_F16,
        TamingVQGAN,
        VQGANConfig,
    )
    from wmar_tpu.utils import checkpoint as ckpt

    if args.tiny:
        if args.model == "rar":
            cfg = MaskGitVQConfig(resolution=16, hidden_channels=32, channel_mult=(1, 2),
                                  num_res_blocks=1, z_channels=16, n_embed=64, embed_dim=16)
            model = MaskGitVQGAN(cfg)
            variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
            return MaskGitRCCAdapter(model, variables), cfg.n_embed, cfg.codes_per_side**2
        cfg = VQGANConfig(resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                          attn_resolutions=(), z_channels=32, n_embed=64, embed_dim=16)
        model = TamingVQGAN(cfg)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        return TamingRCCAdapter(model, variables), cfg.n_embed, cfg.codes_per_side**2

    assert args.modelpath
    if args.model == "rar":
        cfg = MASKGIT_IMAGENET_F16
        model = MaskGitVQGAN(cfg)
        like = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3))))
        variables = ckpt.load_pytree(
            os.path.join(args.modelpath, "maskgit_vqgan.msgpack"),
            jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), like),
        )
        return MaskGitRCCAdapter(model, variables), cfg.n_embed, cfg.codes_per_side**2
    cfg = TAMING_IMAGENET_F16
    model = TamingVQGAN(cfg)
    like = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3))))
    variables = ckpt.load_pytree(
        os.path.join(args.modelpath, "vqgan.msgpack"),
        jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), like),
    )
    return TamingRCCAdapter(model, variables), cfg.n_embed, cfg.codes_per_side**2


def main(argv=None):
    args = get_parser().parse_args(argv)
    if args.dataset != "codes-imagenet":
        raise ValueError(f"Dataset {args.dataset} not supported")
    from wmar_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from wmar_tpu.finetune import RCCConfig, init_state, make_optimizer, make_train_step
    from wmar_tpu.finetune.perceptual import PerceptualLoss
    from wmar_tpu.parallel import make_mesh, shard_batch
    from wmar_tpu.utils import checkpoint as ckpt

    os.makedirs(args.outdir, exist_ok=True)
    adapter, vocab, tokens = build_adapter(args)
    codes = load_codes(args, vocab, tokens)
    # Train/val split (the reference holds out 5% with a fixed seed,
    # finetune.py:195-205).
    val_rows = int(round(codes.shape[0] * args.val_percent)) if not args.no_validate else 0
    if val_rows > 0:
        perm0 = np.random.default_rng(1).permutation(codes.shape[0])
        codes_val = codes[perm0[:val_rows]]
        codes = codes[perm0[val_rows:]]
    else:
        codes_val = codes[:0]
    print(f"dataset: {codes.shape[0]} train / {codes_val.shape[0]} val rows of {codes.shape[1]} tokens")

    n_dev = jax.local_device_count()
    mesh = make_mesh(dp=n_dev, tp=1)
    global_bs = args.batch_size_per_device * n_dev
    steps_per_epoch = max(1, codes.shape[0] // global_bs)

    cfg = RCCConfig(lr=args.lr, idem_weight=args.idempotence_loss_weight)
    optimizer = make_optimizer(cfg, steps_per_epoch=steps_per_epoch)
    state = init_state(adapter, optimizer)
    orig_trainable = jax.tree.map(np.asarray, adapter.init_trainable())

    # Auto-resume (full training state incl. optimizer, like syncseal's
    # checkpoint.pth resume, train_sync.py:317-348).
    start_epoch = 0
    resume_path = os.path.join(args.outdir, "checkpoint.msgpack")
    meta_path = os.path.join(args.outdir, "checkpoint_meta.json")
    if args.resume and os.path.exists(resume_path):
        state = ckpt.load_pytree(resume_path, state)
        with open(meta_path) as f:
            start_epoch = json.load(f)["next_epoch"]
        print(f"resumed from {resume_path} at epoch {start_epoch}")

    lpips_params = None
    if args.lpips_weights and os.path.exists(args.lpips_weights):
        import flax.serialization

        with open(args.lpips_weights, "rb") as f:
            lpips_params = flax.serialization.msgpack_restore(f.read())
    perceptual = PerceptualLoss(lpips_params)

    # GAN branch (reference semantics: taming-only, frozen checkpoint
    # discriminator, generator-side loss term; finetune.py:288-291).
    gan = None
    if not args.disable_gan and args.model == "taming":
        from wmar_tpu.finetune.gan import GanConfig, init_taming_discriminator

        disc_path = args.disc_ckpt or (
            os.path.join(args.modelpath, "discriminator.msgpack")
            if args.modelpath else "")
        disc_params = None
        if disc_path and os.path.exists(disc_path):
            import flax.serialization

            with open(disc_path, "rb") as f:
                tree = flax.serialization.msgpack_restore(f.read())
            disc_params = [tree["layers"][str(i)] if isinstance(tree["layers"], dict)
                           else tree["layers"][i]
                           for i in range(len(tree["layers"]))]
            print(f"GAN branch on: discriminator from {disc_path}")
        elif args.disc_init == "random":
            disc_params = init_taming_discriminator(jax.random.PRNGKey(args.seed))
            print("GAN branch on: RANDOM-INIT discriminator (smoke mode; "
                  "convert the checkpoint's discriminator for real runs)")
        else:
            print("GAN branch requested but no discriminator checkpoint "
                  "found; proceeding GAN-off (pass --disc_init random or "
                  "--disc_ckpt to enable)")
        if disc_params is not None:
            gan = GanConfig.create(
                disc_params, disc_factor=args.disc_factor,
                disc_weight=args.disc_weight, disc_start=args.disc_start)

    # Curriculum: epochs -> level name
    if args.augs == "none":
        levels = ["warmup"] * args.nb_epochs
    else:
        schedule = [int(x) for x in args.augs_schedule.split(",")]
        assert sum(schedule) == args.nb_epochs, "augs_schedule must sum to nb_epochs"
        names = ["warmup", "weak", "medium", "strong"]
        levels = [n for n, e in zip(names, schedule) for _ in range(e)]

    from wmar_tpu.finetune import expand_level, make_val_step
    from wmar_tpu.finetune.rcc import AugBranch  # noqa: F401 (typing aid)
    from wmar_tpu.utils.logging import encoder_drift

    steps = {}
    val_steps = {}

    def run_validation(epoch, level, idem_w, trainable):
        """Per-epoch validation sweep: Identity + each (aug, param) of the
        current curriculum level at p=1.0, reference finetune.py:73-128."""
        import dataclasses as _dc

        if codes_val.shape[0] == 0:
            return {}
        cfg_e = _dc.replace(cfg, idem_weight=idem_w)
        cells = [None] + expand_level(level)
        n_val = max(1, codes_val.shape[0] // global_bs) if codes_val.shape[0] >= global_bs else 1
        if args.val_batches:
            n_val = min(n_val, args.val_batches)
        out = {}
        for branch in cells:
            key_name = "Identity_0" if branch is None else f"{branch.name}_{branch.param}"
            skey = (key_name, idem_w)
            if skey not in val_steps:
                val_steps[skey] = jax.jit(make_val_step(adapter, cfg_e, branch, perceptual))
            vfn = val_steps[skey]
            acc, cnt = {}, 0
            for bi in range(n_val):
                vb = codes_val[bi * global_bs : (bi + 1) * global_bs]
                if vb.shape[0] == 0:
                    break
                # pad the ragged tail up to a full batch so the jit cache
                # keeps one entry, then weight by true rows
                rows = vb.shape[0]
                if rows < global_bs:
                    reps = -(-global_bs // rows)  # tile up to a full batch
                    vb = np.concatenate([vb] * reps)[:global_bs]
                vkey = jax.random.PRNGKey(args.seed + 777 + epoch)
                m = vfn(trainable, shard_batch(mesh, jnp.asarray(vb)), vkey)
                for k, v in m.items():
                    acc[k] = acc.get(k, 0.0) + float(v) * rows
                cnt += rows
            stats = {k: v / max(cnt, 1) for k, v in acc.items()}
            out[key_name] = stats
            print(
                f"Validation {key_name}| Loss: {stats['loss']:.5f}"
                f"| IdemLoss: {stats['idem_loss']:.5f}"
                f"| VQGANLoss: {stats['vqgan_loss']:.5f}"
                f"| L0: {stats['l0']:.5f}"
            )
        enc_d = encoder_drift(trainable["watermark_encoder"], orig_trainable["watermark_encoder"])
        dec_d = encoder_drift(trainable["decoder"], orig_trainable["decoder"])
        print(f"[Val] ENC L2 Distance: {enc_d:.5f}, DEC L2 Distance: {dec_d:.5f}")
        out["drift"] = {"enc": enc_d, "dec": dec_d}
        return out

    rng = np.random.default_rng(args.seed)
    t_start = time.time()
    history = []
    with jax.set_mesh(mesh):
        for epoch, level in enumerate(levels):
            if epoch < start_epoch:
                continue
            # per-epoch idem weight (geometric schedule; baked into the
            # traced program, so the jit cache keys on it)
            idem_w = args.idempotence_loss_weight * (
                args.idempotence_loss_weight_factor ** epoch)
            skey = (level, idem_w)
            if skey not in steps:
                import dataclasses as _dc

                cfg_e = _dc.replace(cfg, idem_weight=idem_w)
                steps[skey] = jax.jit(
                    make_train_step(adapter, cfg_e, level, optimizer, perceptual,
                                    gan=gan)
                )
            step_fn = steps[skey]
            # Validation first, like the reference (finetune.py:388-392).
            val_stats = run_validation(epoch, level, idem_w, state.trainable)
            perm = rng.permutation(codes.shape[0])
            epoch_metrics = []
            for bi in range(steps_per_epoch):
                idx = perm[bi * global_bs : (bi + 1) * global_bs]
                batch = shard_batch(mesh, jnp.asarray(codes[idx]))
                key = jax.random.PRNGKey(args.seed + epoch * 100000 + bi)
                state, metrics = step_fn(state, batch, key)
                if bi % args.log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    m["enc_dist"] = encoder_drift(
                        state.trainable["watermark_encoder"], orig_trainable["watermark_encoder"])
                    m["dec_dist"] = encoder_drift(
                        state.trainable["decoder"], orig_trainable["decoder"])
                    epoch_metrics.append(m)
                    print(f"epoch {epoch} [{level}] step {bi}/{steps_per_epoch}: {m}")
                    print(f"ENC L2 Distance: {m['enc_dist']:.5f}, DEC L2 Distance: {m['dec_dist']:.5f}")
            # Per-epoch checkpoints: full weights + deltas (the published format).
            ckpt.save_pytree(os.path.join(args.outdir, f"epoch{epoch}_trainable.msgpack"), state.trainable)
            ckpt.save_delta(
                os.path.join(args.outdir, f"epoch{epoch}_encoder_delta.msgpack"),
                state.trainable["watermark_encoder"],
                orig_trainable["watermark_encoder"],
            )
            ckpt.save_delta(
                os.path.join(args.outdir, f"epoch{epoch}_decoder_delta.msgpack"),
                state.trainable["decoder"],
                orig_trainable["decoder"],
            )
            history.append({"epoch": epoch, "level": level, "metrics": epoch_metrics,
                            "validation": val_stats})
            ckpt.save_pytree(resume_path, state)
            with open(meta_path, "w") as f:
                json.dump({"next_epoch": epoch + 1}, f)
        # Final validation (reference finetune.py:509-515).
        if levels and codes_val.shape[0]:
            print("Done! Doing final validation.")
            final_idem = args.idempotence_loss_weight * (
                args.idempotence_loss_weight_factor ** (len(levels) - 1))
            final_val = run_validation(len(levels), levels[-1], final_idem, state.trainable)
            history.append({"epoch": len(levels), "level": "final", "metrics": [],
                            "validation": final_val})
    with open(os.path.join(args.outdir, "history.json"), "w") as f:
        json.dump({"wall_s": time.time() - t_start, "epochs": history}, f, indent=1)
    print(f"done in {time.time() - t_start:.1f}s")
    return state


if __name__ == "__main__":
    main(sys.argv[1:])
