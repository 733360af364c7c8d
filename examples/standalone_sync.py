#!/usr/bin/env python
"""Standalone SyncSeal demo — counterpart of the reference's
``syncseal/notebooks/standalone.ipynb``.

Embed the sync signal into an image, hit it with a geometric attack
(upper-left crop) plus a valuemetric one (brightness), run the corner
extractor, and unwarp the attacked image back into canonical frame —
then report where the predicted corners landed vs ground truth, and how
close the unwarped image is to the watermarked original. A second,
harsher pass mirrors the notebook's "failure case" cell.

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python examples/standalone_sync.py --outdir /tmp/sync_demo

Random weights by default (corners will be wrong — the point is the
plumbing); pass ``--ckpt`` with a converted ``syncmodel_paper`` state
dict for real predictions (``SyncSealRef.load_torch``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def load_image(path: str | None, size: int) -> jnp.ndarray:
    """[1, H, W, 3] float32 in [0, 1]."""
    if path:
        from PIL import Image

        arr = np.asarray(
            Image.open(path).convert("RGB").resize((size, size)), np.float32) / 255.0
        return jnp.asarray(arr)[None]
    # Procedural stand-in for the notebook's squirrel photo: smooth field +
    # a few hard edges so the crop/unwarp geometry is visible.
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    small = jax.random.uniform(k1, (1, 8, 8, 3))
    img = jax.image.resize(small, (1, size, size, 3), "bicubic")
    yy, xx = jnp.mgrid[0:size, 0:size]
    img = img.at[:, :, :, 0].add(0.3 * ((xx // 32 + yy // 32) % 2))
    return jnp.clip(img, 0.0, 1.0)


def crop_corners(size: int, factor: float) -> np.ndarray:
    """Where the original TL/TR/BR/BL corners land (normalized x, y) after
    an upper-left crop of `factor` is resized back to full frame: the kept
    region expands, so the original corners move outside except TL."""
    s = 1.0 / factor
    return np.asarray(
        [[0.0, 0.0], [s, 0.0], [s, s], [0.0, s]], np.float32)  # TL TR BR BL


def run_case(model, img01, factor: float, bright: float, tag: str, outdir: str):
    from wmar_tpu.augmentations.geometric import upper_left_crop_resize_back
    from wmar_tpu.augmentations.valuemetric import brightness
    from wmar_tpu.sync.homography import unwarp_from_corners
    from wmar_tpu.utils.metrics import psnr

    imgs_w01 = model.embed01(model.unet_params, img01)
    attacked = brightness(upper_left_crop_resize_back(imgs_w01, factor), bright)

    preds = model.detect01(model.convnext_params, attacked)
    det_logit = float(preds[0, 0])
    pred_tv = np.asarray((preds[:, 1:].reshape(-1, 4, 2) + 1.0) / 2.0)  # TL TR BR BL

    target_tv = crop_corners(img01.shape[1], factor)[None]
    err_px = float(np.linalg.norm(
        (pred_tv - target_tv) * img01.shape[1], axis=-1).mean())

    unwarped = unwarp_from_corners(
        attacked, jnp.asarray(pred_tv)[:, jnp.asarray([0, 1, 3, 2])])  # -> TL TR BL BR
    rec_psnr = float(psnr(unwarped, imgs_w01))
    wm_psnr = float(psnr(imgs_w01, img01))

    print(f"[{tag}] crop {factor:.2f} + brightness {bright:.2f}: "
          f"detect logit {det_logit:+.3f}, mean corner error {err_px:.1f} px, "
          f"unwarp PSNR {rec_psnr:.1f} dB (embed PSNR {wm_psnr:.1f} dB)")
    for name, pts in (("pred", pred_tv[0]), ("true", target_tv[0])):
        pts_s = ", ".join(f"({x:.2f},{y:.2f})" for x, y in pts)
        print(f"    {name} corners (TL TR BR BL, norm xy): {pts_s}")

    try:
        from PIL import Image

        panel = np.concatenate(
            [np.asarray(a[0]) for a in (img01, imgs_w01, attacked, unwarped)], axis=1)
        path = os.path.join(outdir, f"sync_{tag}.png")
        Image.fromarray((np.clip(panel, 0, 1) * 255).astype(np.uint8)).save(path)
        print(f"    panel (orig | embedded | attacked | unwarped): {path}")
    except Exception as e:  # pragma: no cover - PIL is present in this env
        print(f"    (no panel written: {e})")
    return err_px


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="/tmp/sync_demo")
    p.add_argument("--image", default=None, help="input photo (procedural if absent)")
    p.add_argument("--ckpt", default=None, help="converted syncmodel state dict")
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--tiny", action="store_true", help="tiny random model (fast smoke)")
    args = p.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    from wmar_tpu.sync import syncseal_models as sm
    from wmar_tpu.sync.syncseal import SyncSealRef

    if args.ckpt:
        model = SyncSealRef.load_torch(args.ckpt)
    elif args.tiny:
        model = SyncSealRef.init(
            0,
            unet_cfg=sm.UNetConfig(z_channels=8, num_blocks=1,
                                   z_channels_mults=(1, 2), norm_groups=4),
            convnext_cfg=sm.ConvNeXtConfig(depths=(1, 1), dims=(8, 16)))
    else:
        model = SyncSealRef.init(0)

    img01 = load_image(args.image, args.img_size)
    # Notebook's main case: mild crop (the model recovers), then the
    # failure-mode cell: much harder crop outside the training range.
    run_case(model, img01, factor=0.7, bright=1.2, tag="ok", outdir=args.outdir)
    run_case(model, img01, factor=0.35, bright=1.5, tag="hard", outdir=args.outdir)


if __name__ == "__main__":
    main()
