"""Experiment logging: process-0-only metric writer + image panels.

Counterpart of the reference's ``CustomTensorboardWriter``
(``wmar/utils/tensorboard.py``) and its rank-aware printing
(``distributed.py:53-86``): scalars go to JSONL (+ stdout), image panels to
PNG grids. TensorBoard is optional — if ``tensorboardX``/``tf`` are absent
the JSONL stream carries the same data.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


def is_main_process() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


class MetricLogger:
    """Scalars -> <outdir>/metrics.jsonl, image grids -> <outdir>/panels/."""

    def __init__(self, outdir: Optional[str], echo: bool = True):
        self.outdir = outdir
        self.echo = echo
        self.active = is_main_process() and outdir is not None
        self._fh = None
        if self.active:
            os.makedirs(outdir, exist_ok=True)
            self._fh = open(os.path.join(outdir, "metrics.jsonl"), "a")

    def scalars(self, step: int, tag: str = "", **metrics):
        if not self.active:
            return
        rec = {"t": time.time(), "step": int(step), "tag": tag}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self.echo:
            body = " ".join(f"{k}={float(v):.5g}" for k, v in metrics.items())
            print(f"[{tag}] step {step}: {body}")

    def image_panel(self, step: int, name: str, images_pm1: np.ndarray, max_images: int = 8):
        """Save an NHWC [-1,1] batch as one horizontal PNG strip (the
        reference's rec/diff panels, ``finetune.py:427-468``)."""
        if not self.active:
            return
        from PIL import Image

        imgs = np.asarray(images_pm1)[:max_images]
        strip = np.concatenate(list(imgs), axis=1)  # H, W*n, C
        arr = np.clip((strip + 1.0) / 2.0 * 255.0 + 0.5, 0, 255).astype(np.uint8)
        d = os.path.join(self.outdir, "panels")
        os.makedirs(d, exist_ok=True)
        Image.fromarray(arr).save(os.path.join(d, f"{step:06d}_{name}.png"))

    def close(self):
        if self._fh:
            self._fh.close()


def average_metrics(metrics: dict, weight: float = 1.0) -> dict:
    """Weighted cross-process metric averaging — the reference's
    ``average_metrics`` all-reduce (``distributed.py:231-243``)."""
    import jax

    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    vec = np.asarray([float(metrics[k]) * weight for k in keys] + [weight])
    total = multihost_utils.process_allgather(vec).sum(axis=0)
    return {k: float(total[i] / total[-1]) for i, k in enumerate(keys)}


def encoder_drift(trainable_params, orig_params) -> float:
    """L2 drift of finetuned weights vs originals — the reference's
    ENC/DEC drift monitors (``utils.py:170-186``)."""
    import jax

    leaves_a = jax.tree.leaves(trainable_params)
    leaves_b = jax.tree.leaves(orig_params)
    total = 0.0
    for a, b in zip(leaves_a, leaves_b):
        total += float(((np.asarray(a) - np.asarray(b)) ** 2).sum())
    return float(np.sqrt(total))
