#!/usr/bin/env python
"""Convert LPIPS (VGG16 + linear heads) weights to wmar_tpu msgpack.

The RCC finetune's perceptual term uses LPIPS like the reference
(``deps/taming/modules/losses/lpips.py``). This tool converts either the
``lpips`` pip package's weights or a torchvision VGG16 state dict + lin
checkpoint. Host-side, needs torch.

  python tools/convert_lpips.py --out lpips_vgg.msgpack
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# VGG16 conv indices in torchvision's features Sequential, per LPIPS block.
_VGG_TORCH_IDX = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28)]


def convert_lpips_arrays(vgg_sd: dict, lins) -> dict:
    """VGG16 Sequential conv state dict + optional lin-head kernels -> flax
    LPIPS params. Sorts by the NUMERIC Sequential index — alphabetical
    ordering scrambles blocks at the real geometry ("features.10" <
    "features.2")."""
    import re as _re

    def _seq_idx(key):
        return int(_re.search(r"(\d+)", key).group(1))

    params = {"vgg": {}}
    flat = sorted(
        ((k, v) for k, v in vgg_sd.items() if k.endswith("weight") and np.ndim(v) == 4),
        key=lambda kv: _seq_idx(kv[0]),
    )
    biases = sorted(
        ((k, v) for k, v in vgg_sd.items() if k.endswith("bias")),
        key=lambda kv: _seq_idx(kv[0]),
    )
    ci = 0
    for bi, idxs in enumerate(_VGG_TORCH_IDX):
        for j in range(len(idxs)):
            w = np.asarray(flat[ci][1])
            b = np.asarray(biases[ci][1])
            params["vgg"][f"conv{bi}_{j}"] = {
                "kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
                "bias": b,
            }
            ci += 1
    if lins is not None:
        for i, w in enumerate(lins):
            params[f"lin{i}"] = {
                "kernel": np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))
            }
    return params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--vgg_ckpt", default=None, help="torchvision vgg16 state dict (optional)")
    p.add_argument("--lpips_ckpt", default=None, help="LPIPS lin weights (optional)")
    args = p.parse_args(argv)

    try:
        import lpips as lpips_pkg
        import torch

        net = lpips_pkg.LPIPS(net="vgg")
        vgg_feats = net.net.slice1  # noqa: F841  (validated import path)
        vgg_sd = {}
        for si in range(1, 6):
            sl = getattr(net.net, f"slice{si}")
            for k, v in sl.state_dict().items():
                vgg_sd[k] = v.detach().numpy()
        lins = [getattr(net, f"lin{i}").model[1].weight.detach().numpy() for i in range(5)]
    except Exception as e:  # noqa: BLE001
        if not args.vgg_ckpt:
            print(f"lpips package unavailable ({e}); pass --vgg_ckpt/--lpips_ckpt")
            return 1
        from wmar_tpu.utils.convert import load_torch_state_dict

        vgg_sd = load_torch_state_dict(args.vgg_ckpt)
        lins = None
        if args.lpips_ckpt:
            # lpips package lin checkpoint: lin{i}.model.1.weight [1, C, 1, 1]
            lin_sd = load_torch_state_dict(args.lpips_ckpt)
            lins = [np.asarray(lin_sd[f"lin{i}.model.1.weight"]) for i in range(5)]

    params = convert_lpips_arrays(vgg_sd, lins)

    from wmar_tpu.utils.checkpoint import save_pytree

    save_pytree(args.out, {"params": params})
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
