#!/usr/bin/env python
"""End-to-end demo: train the WAM pixel watermark from scratch, then use it
for quadrant geometric synchronization (estimate + revert a rotation).

  python examples/train_wam_sync.py --steps 300 --size 64

Trains the tiny backbone on synthetic images, then: embed 4 quadrant
messages -> rotate the image -> per-pixel message assignment -> fit
(rotation, cuts, flip) -> revert. Prints the estimated vs true rotation.

NOTE: minutes of from-scratch training learn watermark *localization* (the
mask head converges) but not yet reliable per-pixel 32-bit decoding — the
reference sidesteps this entirely by shipping the pretrained ``wam_mit.pth``
(days of training). Use converted pretrained weights for production sync;
this script demonstrates the full training + sync loop mechanics.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def synthetic_images(rng, n, size):
    """Smooth random images (mixtures of low-frequency gradients)."""
    yy, xx = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size), indexing="ij")
    imgs = []
    for _ in range(n):
        c = rng.uniform(-1, 1, (3, 6))
        img = np.stack(
            [
                c[k, 0] * yy + c[k, 1] * xx + c[k, 2] * yy * xx
                + 0.3 * np.sin(c[k, 3] * 6 * yy + c[k, 4] * 6 * xx + c[k, 5])
                for k in range(3)
            ],
            axis=-1,
        )
        img = (img - img.min()) / (img.max() - img.min() + 1e-6)
        imgs.append(img)
    return np.stack(imgs).astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--rotation", type=float, default=10.0)
    args = p.parse_args(argv)

    from wmar_tpu.augmentations import geometric as G
    from wmar_tpu.sync.wam_logic import SyncConfidence, WamSync
    from wmar_tpu.sync.wam_model import WAMConfig, WamPixelModel, make_train_step
    from wmar_tpu.utils import enable_compile_cache

    enable_compile_cache()
    cfg = WAMConfig(nbits=32, hidden=32, latent=64, image_size=args.size, scaling_w=2.0)
    model = WamPixelModel.init(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(args.lr)
    params = {"embedder": model.embedder_params, "extractor": model.extractor_params}
    state = (params, opt.init(params))
    step = jax.jit(make_train_step(cfg, opt))

    rng = np.random.default_rng(0)
    t0 = time.time()
    for i in range(args.steps):
        imgs = jnp.asarray(synthetic_images(rng, args.batch, args.size))
        state, metrics = step(state, imgs, jax.random.PRNGKey(i))
        if i % 50 == 0 or i == args.steps - 1:
            print(
                f"step {i}: loss={float(metrics['loss']):.4f} "
                f"mask={float(metrics['mask_loss']):.4f} bits={float(metrics['bit_loss']):.4f}",
                flush=True,
            )
    print(f"trained in {time.time() - t0:.1f}s")

    trained = WamPixelModel(
        {"params": state[0]["embedder"]["params"]}
        if "params" in state[0]["embedder"]
        else state[0]["embedder"],
        state[0]["extractor"],
        cfg,
    )
    sync = WamSync(trained, image_size=args.size, conf=SyncConfidence(coverage=0.3))

    test = jnp.asarray(synthetic_images(rng, 1, args.size)) * 2.0 - 1.0
    synced = sync.add_sync(test)
    psnr = -10 * np.log10(np.mean((np.asarray(synced) - np.asarray(test)) ** 2) / 4 + 1e-12)
    rotated = G.rotate((synced + 1) / 2, args.rotation) * 2 - 1
    aug_info, positions = sync.estimate((rotated[0] + 1) / 2)
    coverage = (positions >= 0).mean()
    print(f"watermark PSNR: {psnr:.1f} dB, detector coverage after rotation: {coverage:.2f}")
    print(f"true rotation: {args.rotation}, estimated: {aug_info[0]} "
          f"(cuts {aug_info[1]},{aug_info[2]}, flip={aug_info[3]})")
    reverted = sync.remove_sync(rotated)
    aug2, _ = sync.estimate((reverted[0] + 1) / 2)
    print(f"after revert, residual rotation estimate: {aug2[0]}")
    return aug_info


if __name__ == "__main__":
    main(sys.argv[1:])
