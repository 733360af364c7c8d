"""Passive geometric synchronization via quadrant watermark messages.

Port of the reference's ``WamSync`` logic
(``wmar/watermarking/synchronization.py:23-340``): embed four distinct
32-bit messages in the image quadrants (with a center buffer), and at
detection time assign each pixel to its nearest message, then brute-force
the (rotation, horizontal cut, vertical cut, flip) that best explains the
quadrant map — finally undoing that transform before re-tokenization.

The pixel-level watermark model is pluggable (``embedder``): the real WAM
(ViT extractor + VAE embedder) port plugs in here once its weights are
converted; tests use a parity mock. The per-pixel message assignment is
jittable; the brute-force fit is honest host numpy (it is a 41-rotation
argmin over 256x256 count histograms — microseconds, not a bottleneck),
matching the reference's design.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quadrant_messages() -> np.ndarray:
    """The 4 fixed 32-bit messages (``synchronization.py:33-40``)."""
    return np.asarray(
        [
            [0] * 32,
            [0] * 16 + [1] * 16,
            [1] * 16 + [0] * 16,
            [1] * 32,
        ],
        dtype=np.int32,
    )


def create_grid_mask(size: int) -> np.ndarray:
    """4 quadrant masks ``[4, H, W]`` with a cleared center buffer
    (leeway 18px at 256, 36px at 512 — ``synchronization.py:65-88``)."""
    masks = np.zeros((4, size, size), dtype=np.float32)
    half = size // 2
    for i in range(2):
        for j in range(2):
            masks[i * 2 + j, i * half : (i + 1) * half, j * half : (j + 1) * half] = 1.0
    leeway = 18 if size == 256 else 36
    start = size // 2 - leeway // 2
    end = size // 2 + leeway // 2 + 1
    masks[:, :, start:end] = 0
    masks[:, start:end, :] = 0
    return masks


def positions_from_predictions(
    mask_logits: jnp.ndarray,
    bit_logits: jnp.ndarray,
    messages: jnp.ndarray,
    clip_dist: int = 6,
) -> jnp.ndarray:
    """Per-pixel nearest-message assignment (jittable).

    Args:
      mask_logits: ``[H, W]`` watermark-presence logits.
      bit_logits: ``[32, H, W]`` per-pixel bit logits.
      messages: ``[4, 32]`` candidate messages.

    Returns ``[H, W]`` int32 in {-1, 0, 1, 2, 3} (-1 = unassigned), exactly
    the reference's L1 <= 6 and mask > 0.5 rule (``:203-266``).
    """
    bits = (bit_logits > 0).astype(jnp.int32)  # [32, H, W]
    diffs = (bits[None] != messages[:, :, None, None]).sum(axis=1)  # [4, H, W]
    min_idx = jnp.argmin(diffs, axis=0)
    min_dist = jnp.min(diffs, axis=0)
    ok = (min_dist <= clip_dist) & (jax.nn.sigmoid(mask_logits) > 0.5)
    return jnp.where(ok, min_idx, -1).astype(jnp.int32)


def _rotate_labels(wm: np.ndarray, rotation: float) -> np.ndarray:
    """Rotate a label map, one binary mask per label (avoids interpolation
    mixing labels)."""
    from scipy import ndimage

    res = np.zeros_like(wm)
    for i in range(1, 5):
        mask = (wm == i) * 255.0
        mask_rot = ndimage.rotate(mask, rotation, reshape=False)
        res[mask_rot >= 0.5] = i
    return res


def _find_cut(cumsums, pairs, allow_flip: bool, size: int):
    """Best 1-D boundary separating each (left-label, right-label) pair.

    ``cumsums[label]`` is the cumulative count of that label along the cut
    axis. For a pair (l, r), a cut at c is wrong wherever r appears before c
    or l appears after c; flips swap the roles. Mirrors
    ``synchronization.py:99-157`` including the tie-midpoint rule,
    single-component endpoint handling, and component-size weighting.
    """
    error_total = 0.0
    cut_acc = 0.0
    weight = 0.0
    flip_votes = 0.0
    decided_flip = []
    for l, r in pairs:
        cl, cr = cumsums[l], cumsums[r]
        errors_normal = cr + (cl[-1] - cl)
        errors_flipped = cl + (cr[-1] - cr)

        def score(err):
            m = err.min()
            idxs = np.flatnonzero(err == m)
            return m - len(idxs) * 1e-3, idxs, m

        s_n, idx_n, m_n = score(errors_normal)
        s_f, idx_f, m_f = score(errors_flipped)
        if s_n < s_f or not allow_flip:
            is_flipped, errors, idxs = False, errors_normal, idx_n
            flip_votes -= cl[-1] + cr[-1]
        else:
            is_flipped, errors, idxs = True, errors_flipped, idx_f
            flip_votes += cl[-1] + cr[-1]
        decided_flip.append(is_flipped)

        if cr[-1] != 0 and cl[-1] == 0:
            pick = idxs[0] if is_flipped else idxs[-1]
        elif cl[-1] != 0 and cr[-1] == 0:
            pick = idxs[-1] if is_flipped else idxs[0]
        else:
            pick = (idxs[0] + idxs[-1]) // 2

        w = cl[-1] + cr[-1]
        error_total += errors[pick] * w
        cut_acc += pick * w
        weight += w

    if weight == 0:
        return 1e9, size // 2, False
    cut = round(cut_acc / weight)
    flipped = (flip_votes / weight) > 0
    # Recompute the error at the averaged cut.
    error = 0.0
    for l, r in pairs:
        cl, cr = cumsums[l], cumsums[r]
        err = (cl + (cr[-1] - cr)) if flipped else (cr + (cl[-1] - cl))
        error += err[cut]
    return error, int(cut), bool(flipped)


def fit_best_aug(positions: np.ndarray) -> Tuple[int, int, int, bool]:
    """Brute-force (rotation, cut_i, cut_j, flip) over rotations -20..20
    (``synchronization.py:99-201``). ``positions``: [H, W] in {-1..3}."""
    size = positions.shape[-1]
    wm = positions.astype(np.int32) + 1  # labels 1..4, 0 = unassigned
    # Reference uses 40 @256 / 80 @512; generalize proportionally.
    thresh = max(1, size * 40 // 256)
    best = (float("inf"), [0], size // 2, size // 2, False)
    for rotation in range(-20, 21):
        wm_rot = _rotate_labels(wm, rotation) if rotation != 0 else wm
        cums = [{}, {}]
        for dim in range(2):
            for lab in range(1, 5):
                sums = (wm_rot == lab).sum(axis=dim)
                sums = np.where(sums < thresh, 0, sums)
                cums[dim][lab] = np.cumsum(sums)
        # dim=1 (per-row counts) -> horizontal boundary between (1,3),(2,4)
        err_i, cut_i, _ = _find_cut(cums[1], [(1, 3), (2, 4)], allow_flip=False, size=size)
        # dim=0 (per-col counts) -> vertical boundary between (1,2),(3,4);
        # a horizontal flip swaps these pairs.
        err_j, cut_j, flipped = _find_cut(cums[0], [(1, 2), (3, 4)], allow_flip=True, size=size)
        err = err_i + err_j
        if err < best[0]:
            best = (err, [rotation], cut_i, cut_j, flipped)
        elif err == best[0]:
            best[1].append(rotation)
    rotations = best[1]
    best_rotation = round((max(rotations) + min(rotations)) / 2)
    return best_rotation, best[2], best[3], best[4]


def revert_augmentation(img01: jnp.ndarray, aug_info, pad_thresh: Optional[int] = None) -> jnp.ndarray:
    """Undo the estimated transform on one NHWC [0,1] image batch
    (``synchronization.py:268-296``): flip, else rotation (|angle| >= 3),
    else crop-revert (pad bottom/right + resize back)."""
    from wmar_tpu.augmentations import geometric as G

    angle, cut_i, cut_j, flipped = aug_info
    h, w = img01.shape[1:3]
    if flipped:
        return G.hflip(img01)
    if abs(angle) >= 3:
        return G.rotate(img01, float(angle))
    pad_thresh = pad_thresh if pad_thresh is not None else (10 if h == 256 else 25)
    pad_i = 2 * int(cut_i) - h
    pad_i = 0 if pad_i < pad_thresh else pad_i
    pad_j = max(0, 2 * int(cut_j) - w)
    pad_j = 0 if pad_j < pad_thresh else pad_j
    if pad_i > 0 or pad_j > 0:
        img01 = jnp.pad(img01, ((0, 0), (0, pad_i), (0, pad_j), (0, 0)))
        img01 = jax.image.resize(img01, (img01.shape[0], h, w, 3), method="linear", antialias=True)
    return img01


@dataclasses.dataclass
class SyncConfidence:
    """Thresholds for trusting the detector (``:238-252``). ``coverage``
    overrides the reference's size-based factor (0.7 @256 / 0.75 @512)."""

    clip_dist: int = 6
    coverage: Optional[float] = None

    def min_coverage(self, size: int) -> float:
        if self.coverage is not None:
            return self.coverage
        return 0.7 if size == 256 else 0.75


class WamSync:
    """Quadrant-message synchronization over a pluggable pixel watermark.

    ``embedder`` must provide:
      embed(img01 [B,H,W,3], msg [B,32]) -> watermarked img01
      detect(img01 [B,H,W,3]) -> [B, 33, H, W] logits (mask + 32 bits)
    """

    def __init__(self, embedder, image_size: int = 256, conf: Optional[SyncConfidence] = None):
        self.embedder = embedder
        self.image_size = image_size
        self.messages = quadrant_messages()
        self.masks = create_grid_mask(image_size)
        self.conf = conf or SyncConfidence()

    def add_sync(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """imgs NHWC [-1,1] -> synced imgs [-1,1]."""
        img01 = (imgs + 1.0) / 2.0
        out = img01
        b = imgs.shape[0]
        for k in range(4):
            msg = jnp.asarray(np.tile(self.messages[k][None], (b, 1)))
            wm = self.embedder.embed(img01, msg)
            m = jnp.asarray(self.masks[k])[None, :, :, None]
            out = wm * m + out * (1.0 - m)
        return jnp.clip(out * 2.0 - 1.0, -1.0, 1.0)

    def estimate(self, img01_row: jnp.ndarray):
        """One image -> (aug_info, positions). Detection on device, fit on host."""
        preds = self.embedder.detect(img01_row[None])[0]  # [33, H, W]
        positions = positions_from_predictions(
            preds[0], preds[1:], jnp.asarray(self.messages), self.conf.clip_dist
        )
        pos_np = np.asarray(positions)
        h, w = pos_np.shape
        coverage = (pos_np >= 0).sum() / (h * w)
        if coverage < self.conf.min_coverage(h):
            return (0, h // 2, w // 2, False), pos_np  # not confident: no-op
        return fit_best_aug(pos_np), pos_np

    def remove_sync(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """imgs NHWC [-1,1] -> geometry-reverted imgs [-1,1]."""
        img01 = (imgs + 1.0) / 2.0
        out = []
        for i in range(imgs.shape[0]):
            aug_info, _ = self.estimate(img01[i])
            out.append(revert_augmentation(img01[i][None], aug_info)[0])
        return jnp.clip(jnp.stack(out) * 2.0 - 1.0, -1.0, 1.0)
