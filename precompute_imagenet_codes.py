#!/usr/bin/env python
"""Tokenize an image dataset into per-sample .npy code files.

Counterpart of the reference's ``precompute_imagenet_codes.py`` (without its
leftover debug guards, ``:114,120``): encodes images to VQ token files that
``finetune.py`` trains on. Works with any ARMM frontend's tokenizer.

  python precompute_imagenet_codes.py --model taming --modelpath ckpts/taming \\
      --datapath /data/imagenet --outdir codes/ --per_class 50

Images are center-cropped + resized to the tokenizer resolution on the host,
then encoded in jitted device batches.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, choices=["taming", "rar", "chameleon7b"], default="taming")
    p.add_argument("--modelpath", type=str, default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--datapath", type=str, required=True,
                   help="directory of images (class subdirs optional)")
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--per_class", type=int, default=50)
    p.add_argument("--split_file", type=str, default=None,
                   help="restrict to the filenames listed here, one per line "
                        "(the reference's assets/imagenet_512_split_50k.txt "
                        "custom split for 512px Chameleon)")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--chunk_idx", type=int, default=0)
    p.add_argument("--total_chunks", type=int, default=1)
    return p


def load_image(path: str, size: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    s = min(w, h)
    img = img.crop(((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2))
    img = img.resize((size, size), Image.BICUBIC)
    return np.asarray(img, dtype=np.float32) / 127.5 - 1.0  # [-1, 1] HWC


def main(argv=None):
    args = get_parser().parse_args(argv)
    from wmar_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import generate as gen_cli
    import jax.numpy as jnp

    wrapper = gen_cli.load_wrapper(
        argparse.Namespace(
            model=args.model, modelpath=args.modelpath, tiny=args.tiny,
            rar_size="rar_xl", encoder_ft_ckpt=None, decoder_ft_ckpt=None,
        )
    )
    size = wrapper.image_size

    files = sorted(
        glob.glob(os.path.join(args.datapath, "**", "*.JPEG"), recursive=True)
        + glob.glob(os.path.join(args.datapath, "**", "*.jpg"), recursive=True)
        + glob.glob(os.path.join(args.datapath, "**", "*.png"), recursive=True)
    )
    if args.split_file:
        with open(args.split_file) as fh:
            wanted = {line.strip() for line in fh if line.strip()}
        files = [f for f in files
                 if os.path.basename(f) in wanted
                 or os.path.splitext(os.path.basename(f))[0] in wanted]
    # Group by class dir, cap per_class.
    by_class = {}
    for f in files:
        cls = os.path.basename(os.path.dirname(f))
        by_class.setdefault(cls, [])
        if len(by_class[cls]) < args.per_class:
            by_class[cls].append(f)
    selected = [f for fs in by_class.values() for f in fs]
    selected = selected[args.chunk_idx :: args.total_chunks]
    print(f"encoding {len(selected)} images at {size}px")

    os.makedirs(args.outdir, exist_ok=True)
    for i in range(0, len(selected), args.batch_size):
        batch_files = selected[i : i + args.batch_size]
        imgs = np.stack([load_image(f, size) for f in batch_files])
        codes = np.asarray(wrapper.images_to_codes(jnp.asarray(imgs)))
        for f, c in zip(batch_files, codes):
            cls = os.path.basename(os.path.dirname(f))
            stem = os.path.splitext(os.path.basename(f))[0]
            np.save(os.path.join(args.outdir, f"{cls}_{stem}.npy"), c)
        print(f"{i + len(batch_files)}/{len(selected)}")


if __name__ == "__main__":
    main(sys.argv[1:])
