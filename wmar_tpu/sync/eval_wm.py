"""Watermark robustness evaluated THROUGH the sync layer.

TPU-native rebuild of ``syncseal/syncseal/evals/eval_wm.py:1-402``: embed a
baseline watermark, stack the synchronization watermark on top, attack with
the geometric x valuemetric grid, invert geometry from the sync model's
corner predictions, extract the watermark from the unwarped image, and
report bit accuracy / log p-value / corner error per grid cell to CSV with
a grouped summary.

Differences by design (not omissions):

* Geometric attacks are expressed as corner homographies applied with one
  jittable ``apply_tv_corner_warp`` — every aug family (identity / hflip /
  rotate / crop / perspective) is the same static-shape warp, so the whole
  per-cell pipeline compiles once instead of dispatching per-aug torch ops.
* Everything runs batched over the sample set per grid cell (the reference
  loops images in Python); the grid loop is host-side because aug names and
  JPEG tables are static.

Usage::

    python -m wmar_tpu.sync.eval_wm --baseline ss --sync_model sift \
        --num_samples 4 --img_size 128 --only_identity true \
        --output_dir /tmp/wm_sync_eval
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wmar_tpu.sync.baselines import (
    EmbedderExtractor,
    bit_accuracy,
    build_baseline,
    pvalue,
)
from wmar_tpu.sync.homography import unwarp_from_corners
from wmar_tpu.sync.syncseal import (
    TV_CORNERS,
    SyncSealRef,
    apply_tv_corner_warp,
    sift_ransac_corners,
)

CSV_HEADER = ("index,geom_aug,geom_strength,val_aug,val_strength,"
              "bit_accuracy,log_pvalue,corner_error,wm_embed_time,"
              "sync_embed_time,sync_detect_time,unwrap_time,wm_detect_time")


# ---------------------------------------------------------------------------
# Geometric grid as corner endpoints (eval_wm.py:69-98)
# ---------------------------------------------------------------------------

GEOM_GRID: Dict[str, List[float]] = {
    "identity": [0],
    "hflip": [0],
    "rotate": [5, 10, 20, 30, 45, 90],
    "crop": [0.1, 0.2, 0.3, 0.5, 0.6, 0.7, 0.8, 0.9],
    "perspective": [0.1, 0.2, 0.3, 0.4, 0.5],
}


def geom_endpoints(name: str, param: float, rng: np.random.Generator,
                   batch: int, topleft_crop: bool = False) -> np.ndarray:
    """Where the original TL/TR/BR/BL corners land, ``[B, 4, 2]`` in [0,1].

    ``crop`` treats the param as the retained AREA ratio (torchvision
    ``RandomResizedCrop`` convention used by the reference's Crop aug);
    ``topleft_crop`` anchors it at the origin (the reference does this for
    ``WAMSyncModel``, eval_wm.py:90-92). ``perspective`` jitters each corner
    inward by up to ``param/2`` like ``RandomPerspective``.
    """
    canon = np.asarray(TV_CORNERS)  # TL TR BR BL
    center = np.asarray([0.5, 0.5], np.float32)
    out = np.tile(canon[None], (batch, 1, 1)).astype(np.float32)
    if name == "identity":
        pass
    elif name == "hflip":
        out[:, :, 0] = 1.0 - out[:, :, 0]
    elif name == "rotate":
        theta = np.deg2rad(param)
        c, s = np.cos(theta), np.sin(theta)
        rot = np.asarray([[c, -s], [s, c]], np.float32)
        out = (out - center) @ rot.T + center
    elif name == "crop":
        f = float(np.sqrt(param))  # linear crop fraction from area ratio
        if topleft_crop:
            out = out / f  # visible region [0, f]^2 fills the frame
        else:
            out = (out - center) / f + center  # center crop (zoom-in)
    elif name == "perspective":
        inward = np.asarray([[1, 1], [-1, 1], [-1, -1], [1, -1]], np.float32)
        jitter = rng.uniform(0.0, param / 2.0, size=(batch, 4, 2)).astype(np.float32)
        out = out + jitter * inward
    else:
        raise ValueError(f"unknown geometric aug: {name}")
    return out


# ---------------------------------------------------------------------------
# Valuemetric grid (augmentation/__init__.py get_validation_augs)
# ---------------------------------------------------------------------------


def valuemetric_grid(only_identity: bool = False
                     ) -> List[Tuple[str, list, Callable]]:
    """``(name, strengths, fn(imgs01, strength, rng) -> imgs01)`` rows
    mirroring ``get_validation_augs(only_valuemetric=True)``."""
    from wmar_tpu.augmentations import valuemetric as V

    if only_identity:
        return [("identity", [0], lambda x, s, r: x)]

    def jpeg_brightness(x, s, r):
        q, b = s
        return jnp.clip(V.brightness(V.jpeg_diff(jnp.clip(x, 0, 1), q), b), 0, 1)

    return [
        ("identity", [0], lambda x, s, r: x),
        ("brightness", [0.5, 1.5, 2.0],
         lambda x, s, r: jnp.clip(V.brightness(x, s), 0, 1)),
        ("contrast", [0.5, 1.5, 2.0],
         lambda x, s, r: jnp.clip(V.contrast(x, s), 0, 1)),
        ("hue", [-0.2, -0.1, 0.1, 0.2],
         lambda x, s, r: jnp.clip(V.hue(x, s), 0, 1)),
        ("grayscale", [-1], lambda x, s, r: V.grayscale(x)),
        ("jpeg", [20, 40, 60, 80],
         lambda x, s, r: V.jpeg_diff(jnp.clip(x, 0, 1), int(s))),
        ("gaussian_blur", [3, 9, 17],
         lambda x, s, r: V.gaussian_blur(x, int(s))),
        ("jpeg+brightness", [(40, 2.0), (80, 2.0)], jpeg_brightness),
    ]


# ---------------------------------------------------------------------------
# Sync models (eval_wm.py:293-328 load_sync_model)
# ---------------------------------------------------------------------------


class SiftSync:
    """SIFT+RANSAC corner estimation against the pre-attack watermarked
    image (``SIFTSyncModel``, sync_model.py:273-360). Host-side OpenCV."""

    needs_reference = True

    def predict_corners(self, attacked01: jnp.ndarray,
                        reference01: jnp.ndarray) -> np.ndarray:
        b = attacked01.shape[0]
        out = np.tile(np.asarray(TV_CORNERS)[None], (b, 1, 1)).astype(np.float32)
        for i in range(b):
            est = sift_ransac_corners(np.asarray(reference01[i]),
                                      np.asarray(attacked01[i]))
            if est is not None:
                out[i] = est
        return out


class SyncSealSync:
    """Learned corner regression (the shipped SyncSeal extractor)."""

    needs_reference = False

    def __init__(self, model: SyncSealRef):
        self.model = model
        self._detect = jax.jit(model.detect01)

    def predict_corners(self, attacked01, reference01=None) -> np.ndarray:
        preds = self._detect(self.model.convnext_params, attacked01)
        corners = (np.asarray(preds[:, 1:]).reshape(-1, 4, 2) + 1.0) / 2.0
        return corners.astype(np.float32)


class WamSyncBaseline:
    """WAM quadrant-logic corner baseline (``WAMSyncModel``,
    sync_model.py:363-448) over the native WamSync estimator."""

    needs_reference = False

    def __init__(self, wam_sync):
        self.wam_sync = wam_sync

    def predict_corners(self, attacked01, reference01=None) -> np.ndarray:
        from wmar_tpu.sync.syncseal import wam_corner_baseline

        pm1 = jnp.asarray(attacked01) * 2.0 - 1.0
        pred = wam_corner_baseline(self.wam_sync, pm1)  # [B, 8] in [-1, 1]
        return ((pred.reshape(-1, 4, 2) + 1.0) / 2.0).astype(np.float32)


def load_sync(name: str, sync_path: Optional[str] = None, tiny: bool = False):
    """'none' | 'sift' | 'syncseal' (msgpack path or --tiny random) |
    'wam' (needs converted wam_mit.pth via sync_path)."""
    if name == "none":
        return None
    if name in ("sift", "baseline/sift"):
        return SiftSync()
    if name == "syncseal":
        if sync_path:
            return SyncSealSync(SyncSealRef.load(sync_path))
        if tiny:
            return SyncSealSync(SyncSealRef.init(0))
        raise ValueError("syncseal sync needs --sync_path (msgpack) or --tiny")
    if name in ("wam", "baseline/wam"):
        from wmar_tpu.sync.wam_exact import WamExact, init_wam_params
        from wmar_tpu.sync.wam_logic import WamSync

        if sync_path:
            wam = WamExact.load(sync_path)
        elif tiny:
            wam = WamExact(init_wam_params(0))
        else:
            raise ValueError("wam sync needs --sync_path (wam_mit.pth) or --tiny")
        return WamSyncBaseline(WamSync(wam))
    raise ValueError(f"unknown sync model: {name}")


# ---------------------------------------------------------------------------
# The eval loop (eval_wm.py:46-267)
# ---------------------------------------------------------------------------


def _timer():
    t0 = time.perf_counter()
    return lambda: time.perf_counter() - t0


def evaluate_watermark_with_sync(
    baseline: EmbedderExtractor,
    sync,
    imgs01: jnp.ndarray,
    output_dir: str,
    only_identity: bool = False,
    seed: int = 0,
    topleft_crop: bool = False,
    geoms: Optional[Dict[str, List[float]]] = None,
) -> List[dict]:
    """Run the full grid over a batch ``imgs01 [B, H, W, 3]``; write
    ``watermark_sync_metrics.csv`` (reference column layout) and return the
    row dicts."""
    os.makedirs(output_dir, exist_ok=True)
    csv_path = os.path.join(output_dir, "watermark_sync_metrics.csv")
    b, h, w, _ = imgs01.shape
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    msgs = baseline.get_random_msg(key, b)
    tic = _timer()
    embedded = baseline.embed(imgs01, msgs)
    imgs_wm = jax.block_until_ready(embedded["imgs_w"])
    wm_embed_time = tic()

    tic = _timer()
    if sync is not None and isinstance(sync, SyncSealSync):
        imgs_sync = jnp.clip(
            sync.model.embed01(sync.model.unet_params, imgs_wm), 0, 1)
    else:
        imgs_sync = imgs_wm  # SIFT/WAM/none add no sync signal of their own
    imgs_sync = jax.block_until_ready(imgs_sync)
    sync_embed_time = tic()

    # only_identity trims the VALUEMETRIC axis (reference eval_wm.py:63-66);
    # the geometric grid always runs in full unless explicitly overridden.
    geoms = GEOM_GRID if geoms is None else geoms
    vgrid = valuemetric_grid(only_identity=only_identity)

    @jax.jit
    def warp_cell(imgs, corners):
        return apply_tv_corner_warp(imgs, corners)

    @jax.jit
    def unwarp_cell(imgs, corners01):
        order = jnp.asarray([0, 1, 3, 2])  # TV -> TL TR BL BR
        return unwarp_from_corners(imgs, corners01[:, order])

    rows: List[dict] = []
    with open(csv_path, "w") as f:
        f.write(CSV_HEADER + "\n")
        for gname, params in geoms.items():
            for gparam in params:
                true_c = geom_endpoints(gname, gparam, rng, b,
                                        topleft_crop=topleft_crop)
                geom_imgs = warp_cell(imgs_sync, jnp.asarray(true_c))
                for vname, strengths, vfn in vgrid:
                    for s in strengths:
                        attacked = jnp.clip(vfn(geom_imgs, s, rng), 0, 1)

                        tic = _timer()
                        if sync is not None:
                            if getattr(sync, "needs_reference", False):
                                pred_c = sync.predict_corners(attacked, imgs_sync)
                            else:
                                pred_c = sync.predict_corners(attacked)
                            sync_detect_time = tic()
                            tic = _timer()
                            unwarped = jax.block_until_ready(
                                unwarp_cell(attacked, jnp.asarray(pred_c)))
                            unwrap_time = tic()
                            err_px = np.linalg.norm(
                                (pred_c - true_c) * np.asarray([w - 1, h - 1]),
                                axis=-1)
                            corner_error = float(err_px.mean())
                        else:
                            sync_detect_time = tic()
                            unwarped, unwrap_time = attacked, 0.0
                            corner_error = float("nan")

                        tic = _timer()
                        det = baseline.detect(unwarped)
                        preds = jax.block_until_ready(det["preds"][:, 1:])
                        wm_detect_time = tic()

                        acc = float(bit_accuracy(preds, msgs).mean())
                        pv = float(np.mean(pvalue(preds, msgs)))
                        row = {
                            "geom_aug": f"{gname}_{gparam}",
                            "geom_strength": gparam,
                            "val_aug": f"{vname}_{s}",
                            "val_strength": s,
                            "bit_accuracy": acc,
                            "log_pvalue": float(np.log10(pv + 1e-300)),
                            "corner_error": corner_error,
                        }
                        rows.append(row)
                        f.write(
                            f"0,{row['geom_aug']},{gparam},{row['val_aug']},"
                            f"{s},{acc:.4f},{row['log_pvalue']:.4f},"
                            f"{corner_error:.4f},{wm_embed_time:.6f},"
                            f"{sync_embed_time:.6f},{sync_detect_time:.6f},"
                            f"{unwrap_time:.6f},{wm_detect_time:.6f}\n")
                        f.flush()
    return rows


def grouped_summary(rows: List[dict]) -> str:
    """Mean bit accuracy per (geom_aug, val_aug), plus the overall mean —
    the reference's closing pandas groupby (eval_wm.py:389-397)."""
    by: Dict[Tuple[str, str], List[float]] = {}
    for r in rows:
        by.setdefault((r["geom_aug"], r["val_aug"]), []).append(r["bit_accuracy"])
    lines = ["geom_aug,val_aug,bit_accuracy"]
    for (g, v), accs in sorted(by.items()):
        lines.append(f"{g},{v},{np.mean(accs):.4f}")
    allacc = np.mean([r["bit_accuracy"] for r in rows])
    lines.append(f"all,all,{allacc:.4f}")
    return "\n".join(lines)


def _synthetic_images(n: int, size: int, seed: int) -> jnp.ndarray:
    """Structured pseudo-photos: smooth gradients + low-freq blobs, so SIFT
    has features and JPEG behaves realistically."""
    rng = np.random.default_rng(seed)
    low = rng.normal(0, 1, size=(n, size // 8, size // 8, 3)).astype(np.float32)
    base = jax.image.resize(jnp.asarray(low), (n, size, size, 3), "bicubic")
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    grad = (0.3 * xx + 0.2 * yy)[None, :, :, None]
    speck = rng.normal(0, 0.03, size=(n, size, size, 3)).astype(np.float32)
    imgs = 0.5 + 0.25 * np.asarray(base) + grad - 0.25 + speck
    return jnp.clip(jnp.asarray(imgs), 0.0, 1.0)


def _load_images(path: str, n: int, size: int) -> jnp.ndarray:
    from PIL import Image

    files = sorted(
        os.path.join(path, fn) for fn in os.listdir(path)
        if fn.lower().endswith((".png", ".jpg", ".jpeg")))[:n]
    out = []
    for fn in files:
        im = Image.open(fn).convert("RGB").resize((size, size), Image.BILINEAR)
        out.append(np.asarray(im, np.float32) / 255.0)
    if not out:
        raise ValueError(f"no images under {path}")
    return jnp.asarray(np.stack(out))


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Watermark detection through sync-based geometric "
                    "inversion (reference evals/eval_wm.py)")
    p.add_argument("--baseline", required=True,
                   help="ss | wam | wam_noattenuation | hidden | mbrs | cin "
                        "| trustmark | videoseal")
    p.add_argument("--baseline_path", default=None,
                   help="converted params for checkpoint-backed baselines")
    p.add_argument("--sync_model", required=True,
                   help="none | sift | syncseal | wam")
    p.add_argument("--sync_path", default=None)
    p.add_argument("--num_samples", type=int, default=10)
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--images", default=None, help="directory of images; "
                   "synthetic if omitted")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--only_identity", default="false",
                   choices=["true", "false"])
    p.add_argument("--tiny", action="store_true",
                   help="allow random-init models (smoke tests only)")
    p.add_argument("--output_dir", default="output/wm_sync_eval")
    args = p.parse_args(argv)

    baseline = build_baseline(args.baseline, params_path=args.baseline_path,
                              img_size=args.img_size,
                              allow_random=args.tiny, seed=args.seed)
    sync = load_sync(args.sync_model, sync_path=args.sync_path,
                     tiny=args.tiny)
    if args.images:
        imgs01 = _load_images(args.images, args.num_samples, args.img_size)
    else:
        imgs01 = _synthetic_images(args.num_samples, args.img_size, args.seed)

    rows = evaluate_watermark_with_sync(
        baseline, sync, imgs01, args.output_dir,
        only_identity=args.only_identity == "true", seed=args.seed,
        topleft_crop=args.sync_model in ("wam", "baseline/wam"))
    summary = grouped_summary(rows)
    print("\nGrouped Bit Accuracy by Geometric and Value-Metric Augmentation:")
    print(summary)
    with open(os.path.join(args.output_dir, "summary.csv"), "w") as f:
        f.write(summary + "\n")


if __name__ == "__main__":
    main()
