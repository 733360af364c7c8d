"""SyncSeal training entry point (counterpart of syncseal/train_sync.py).

Trains the reference-spec sync model — UNet-yuv embedder + ConvNeXtV2 corner
extractor — with the full objective (perceptual + hinge-GAN + detection BCE +
corner MSE), dual optimizers, an optional linear scaling_w schedule, and a
detector-only finetune phase (train_sync.py:250-405).

Data: a directory of images (png/jpg) or .npy arrays in [0,1]; with
``--synthetic`` it trains on procedural images for smoke tests.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def str2bool(v):
    return str(v).lower() in ("1", "true", "yes")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", required=True)
    p.add_argument("--data_dir", default=None, help="dir of images or .npy in [0,1]")
    p.add_argument("--synthetic", type=str2bool, default=False,
                   help="train on procedural images (smoke test)")
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--steps_per_epoch", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--scaling_w", type=float, default=0.2)
    p.add_argument("--scaling_w_min", type=float, default=None,
                   help="linear schedule target (train_sync.py scaling_w_schedule)")
    p.add_argument("--lambda_i", type=float, default=1.0)
    p.add_argument("--lambda_d", type=float, default=1.0)
    p.add_argument("--lambda_det", type=float, default=1.0)
    p.add_argument("--lambda_sync", type=float, default=10.0)
    p.add_argument("--disc_start", type=int, default=0)
    p.add_argument("--finetune_detector_start", type=int, default=10**9)
    p.add_argument("--tiny", action="store_true", help="tiny configs (smoke test)")
    p.add_argument("--dataset_config", default=None,
                   help="reference-grammar datasets yaml: train_dir/val_dir (train_sync.py:59)")
    p.add_argument("--embedder_config", default=None,
                   help="reference-grammar embedder.yaml (train_sync.py:69)")
    p.add_argument("--extractor_config", default=None,
                   help="reference-grammar extractor.yaml (train_sync.py:71)")
    p.add_argument("--attenuation_config", default=None,
                   help="reference-grammar attenuation.yaml (train_sync.py:73)")
    p.add_argument("--augmentation_config", default=None,
                   help="reference-grammar all_augs.yaml aug weights (train_sync.py:81)")
    p.add_argument("--resume", type=str2bool, default=True)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--eval_freq", type=int, default=5)
    return p.parse_args()


def load_batch_source(args):
    if args.synthetic or not args.data_dir:
        def batches(rng):
            while True:
                rng, k = jax.random.split(rng)
                # smooth random fields: low-freq noise upsampled
                small = jax.random.uniform(k, (args.batch_size, 16, 16, 3))
                yield jax.image.resize(
                    small, (args.batch_size, args.img_size, args.img_size, 3), "bilinear"
                )
        return batches(jax.random.PRNGKey(args.seed))

    paths = sorted(
        glob.glob(os.path.join(args.data_dir, "*.npy"))
        + glob.glob(os.path.join(args.data_dir, "*.png"))
        + glob.glob(os.path.join(args.data_dir, "*.jpg"))
    )
    if not paths:
        raise SystemExit(f"no images found in {args.data_dir}")

    def load(path):
        if path.endswith(".npy"):
            arr = np.load(path)
        else:
            from PIL import Image

            arr = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        if arr.shape[:2] != (args.img_size, args.img_size):
            arr = np.asarray(jax.image.resize(
                jnp.asarray(arr), (args.img_size, args.img_size, 3), "bilinear"))
        return arr.astype(np.float32)

    def batches(rng_np):
        while True:
            idx = rng_np.integers(0, len(paths), size=args.batch_size)
            yield jnp.asarray(np.stack([load(paths[i]) for i in idx]))

    return batches(np.random.default_rng(args.seed))


def main():
    import optax

    from wmar_tpu.sync import syncseal_models as sm
    from wmar_tpu.sync.syncseal import (
        RefTrainConfig,
        SyncSealRef,
        evaluate_sync_ref,
        init_ref_train_state,
        make_ref_train_steps,
        scaling_w_at,
    )
    from wmar_tpu.utils import checkpoint as ckpt

    args = parse_args()
    os.makedirs(args.output_dir, exist_ok=True)

    if args.tiny:
        unet_cfg = sm.UNetConfig(z_channels=8, num_blocks=1,
                                 z_channels_mults=(1, 2), norm_groups=4)
        cn_cfg = sm.ConvNeXtConfig(depths=(1, 1), dims=(8, 16))
    else:
        unet_cfg, cn_cfg = sm.UNET_SMALL2_YUV, sm.CONVNEXT_TINY

    # Reference-grammar yaml configs override the defaults (train_sync.py:59-82);
    # they are also copied into the output dir like the reference does
    # (train_sync.py:197-201) so a run is self-describing.
    from wmar_tpu.sync import configs as sync_configs

    if args.dataset_config:
        ds = sync_configs.load_dataset_config(args.dataset_config)
        if not args.data_dir:
            args.data_dir = ds["train_dir"]

    aug_weights = None
    cfg_out = os.path.join(args.output_dir, "configs")
    for flag, loader, saved in (
        ("embedder_config", sync_configs.load_embedder_config, "embedder.yaml"),
        ("extractor_config", sync_configs.load_extractor_config, "extractor.yaml"),
        ("attenuation_config", sync_configs.load_attenuation_config, "attenuation.yaml"),
        ("augmentation_config", sync_configs.load_augs_config, "augs.yaml"),
    ):
        path = getattr(args, flag)
        if path is None:
            continue
        val = loader(path)
        if flag == "embedder_config":
            unet_cfg = val
        elif flag == "extractor_config":
            cn_cfg = val
        elif flag == "augmentation_config":
            aug_weights = val
        os.makedirs(cfg_out, exist_ok=True)
        with open(path) as src, open(os.path.join(cfg_out, saved), "w") as dst:
            dst.write(src.read())

    model = SyncSealRef.init(args.seed, unet_cfg=unet_cfg, convnext_cfg=cn_cfg)
    cfg = RefTrainConfig(
        scaling_w=args.scaling_w, scaling_w_min=args.scaling_w_min,
        schedule_epochs=args.epochs, lambda_i=args.lambda_i, lambda_d=args.lambda_d,
        lambda_det=args.lambda_det, lambda_sync=args.lambda_sync,
        disc_start=args.disc_start,
        finetune_detector_start=args.finetune_detector_start,
    )
    # AdamW + cosine, the reference's optimizer family (params.json)
    sched = optax.cosine_decay_schedule(args.lr, args.epochs * args.steps_per_epoch, 1e-2)
    optimizer = optax.adamw(sched)
    optimizer_d = optax.adamw(sched)
    perceptual = None
    if args.lambda_i > 0 and not args.tiny:
        from wmar_tpu.finetune.perceptual import PerceptualLoss

        perceptual = PerceptualLoss()
    model_step, disc_step = make_ref_train_steps(
        model, optimizer, optimizer_d, cfg,
        perceptual=perceptual or (lambda a, b: ((a - b) ** 2).mean(axis=(1, 2, 3))),
        aug_weights=aug_weights,
    )
    model_step = jax.jit(model_step)
    disc_step = jax.jit(disc_step)
    state = init_ref_train_state(model, optimizer, optimizer_d, seed=args.seed)

    ckpt_path = os.path.join(args.output_dir, "checkpoint.msgpack")
    start_epoch = 0
    if args.resume and os.path.exists(ckpt_path):
        meta = json.load(open(ckpt_path + ".json"))
        start_epoch = meta["epoch"] + 1
        state = ckpt.load_pytree(ckpt_path, state)
        print(f"resumed from epoch {meta['epoch']}")

    source = load_batch_source(args)
    rng = jax.random.PRNGKey(args.seed)
    log_path = os.path.join(args.output_dir, "log.jsonl")
    for epoch in range(start_epoch, args.epochs):
        sw = jnp.float32(scaling_w_at(cfg, epoch))
        detector_only = jnp.bool_(epoch >= cfg.finetune_detector_start)
        t0 = time.time()
        metrics = {}
        for step in range(args.steps_per_epoch):
            imgs = next(source)
            rng, k1, k2 = jax.random.split(rng, 3)
            gstep = epoch * args.steps_per_epoch + step
            disc_factor = jnp.float32(1.0 if gstep >= cfg.disc_start else 0.0)
            state, metrics = model_step(state, imgs, k1, sw, disc_factor, detector_only)
            if not bool(detector_only):
                state, dmetrics = disc_step(state, imgs, k2, sw, disc_factor)
                metrics = {**metrics, **dmetrics}
        row = {"epoch": epoch, "scaling_w": float(sw),
               "secs": round(time.time() - t0, 2),
               **{k: float(v) for k, v in metrics.items()}}
        print(json.dumps(row))
        with open(log_path, "a") as f:
            f.write(json.dumps(row) + "\n")

        ckpt.save_pytree(ckpt_path, state)
        with open(ckpt_path + ".json", "w") as f:
            json.dump({"epoch": epoch}, f)
        trained = SyncSealRef(state[0]["unet"], state[0]["convnext"],
                              unet_cfg=unet_cfg, convnext_cfg=cn_cfg)
        trained.save(os.path.join(args.output_dir, "syncmodel.msgpack"))

        if (epoch + 1) % args.eval_freq == 0 or epoch == args.epochs - 1:
            rng, k = jax.random.split(rng)
            report = evaluate_sync_ref(trained, next(source), k,
                                       with_sift_baseline=not args.tiny)
            print("eval:", json.dumps(report["quality"]),
                  "corner_mae[0]:", report["grid"][0]["corner_mae"])
            with open(os.path.join(args.output_dir, f"eval_{epoch:04}.json"), "w") as f:
                json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
