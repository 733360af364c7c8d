"""SyncSeal: trainable active geometric synchronization.

TPU-native rebuild of the reference's standalone ``syncseal/`` sub-project
(``syncseal/models/sync_model.py``): an embedder writes an imperceptible
synchronization signal (JND-attenuated), an extractor predicts the 8
normalized corner coordinates of the original frame after a geometric
attack, and ``unwarp`` inverts the estimated homography before watermark
detection.

Architecture: ConvNeXt-style embedder (reference default ``convnext_tiny`` +
pixel decoder, ``models/embedder.py``), ViT extractor with a corner head
(reference default ``sam_tiny``, ``models/extractor.py``), Laplacian JND
attenuation (``modules/jnd.py``). The training loop mirrors
``train_sync.py``: embed -> 8-bit rounding (ST) -> valuemetric augs ->
geometric homography aug with ground-truth corner points -> corner MAE +
perceptual loss.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from wmar_tpu.sync.homography import solve_homography, unwarp_from_corners, warp_perspective

CANON_CORNERS = np.asarray(
    [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], dtype=np.float32
)  # TL TR BL BR, normalized (x, y)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class ConvNeXtBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (7, 7), feature_group_count=self.dim, name="dwconv")(x)
        h = nn.LayerNorm(name="norm")(h)
        h = nn.Dense(4 * self.dim, name="pw1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, name="pw2")(h)
        gamma = self.param("gamma", lambda k: jnp.full((self.dim,), 1e-6))
        return x + gamma * h


class ConvNeXtEmbedder(nn.Module):
    """ConvNeXt trunk + upsampling pixel decoder -> 3-channel signal delta."""

    depths: Sequence[int] = (2, 2, 4)
    dims: Sequence[int] = (48, 96, 192)

    @nn.compact
    def __call__(self, x01):
        x = x01 * 2.0 - 1.0
        feats = []
        h = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), name="stem")(x)
        h = nn.LayerNorm(name="stem_norm")(h)
        for si, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if si > 0:
                h = nn.LayerNorm(name=f"down_norm{si}")(h)
                h = nn.Conv(dim, (2, 2), strides=(2, 2), name=f"down{si}")(h)
            for bi in range(depth):
                h = ConvNeXtBlock(dim, name=f"block{si}_{bi}")(h)
            feats.append(h)
        # pixel decoder: progressive upsample + skip fusion
        h = feats[-1]
        for si in reversed(range(len(self.dims) - 1)):
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
            h = nn.Conv(self.dims[si], (3, 3), name=f"up{si}")(h)
            h = nn.gelu(h + feats[si])
        b, hh, ww, c = h.shape
        h = jax.image.resize(h, (b, hh * 4, ww * 4, c), "bilinear")
        return nn.Conv(3, (3, 3), kernel_init=nn.initializers.zeros, name="out")(h)


class ViTExtractor(nn.Module):
    """Patch ViT -> mean-pool -> 8 normalized corner coordinates."""

    patch: int = 8
    dim: int = 192
    depth: int = 4
    heads: int = 4

    @nn.compact
    def __call__(self, x01):
        x = x01 * 2.0 - 1.0
        h = nn.Conv(self.dim, (self.patch, self.patch), strides=(self.patch, self.patch),
                    name="patch_embed")(x)
        b, gh, gw, c = h.shape
        h = h.reshape(b, gh * gw, c)
        pos = self.param("pos", nn.initializers.normal(0.02), (1, gh * gw, c))
        h = h + pos
        for li in range(self.depth):
            hn = nn.LayerNorm(name=f"ln1_{li}")(h)
            h = h + nn.MultiHeadDotProductAttention(self.heads, name=f"attn_{li}")(hn)
            hn = nn.LayerNorm(name=f"ln2_{li}")(h)
            h = h + nn.Dense(self.dim, name=f"fc2_{li}")(
                nn.gelu(nn.Dense(4 * self.dim, name=f"fc1_{li}")(hn))
            )
        h = nn.LayerNorm(name="ln_f")(h).mean(axis=1)
        out = nn.Dense(8, name="head")(h)
        # Predict offsets around the canonical corners; sigmoid keeps the
        # prediction in-frame like the reference's normalized coords.
        return nn.sigmoid(out.reshape(b, 4, 2) + jnp.asarray(CANON_CORNERS) * 4.0 - 2.0)


def jnd_heatmap(x01: jnp.ndarray) -> jnp.ndarray:
    """Just-noticeable-difference attenuation (``modules/jnd.py``): higher
    where luminance masking tolerates change (bright/dark + busy regions)."""
    lum = x01.mean(-1, keepdims=True)
    # local activity via Laplacian magnitude
    k = jnp.asarray([[0, 1, 0], [1, -4, 1], [0, 1, 0]], jnp.float32)[:, :, None, None]
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (3, 3, 1, 1), ("NHWC", "HWIO", "NHWC"))
    act = jnp.abs(
        jax.lax.conv_general_dilated(lum, k, (1, 1), "SAME", dimension_numbers=dn)
    )
    lum_mask = 0.5 + jnp.abs(lum - 0.5)  # more headroom near black/white
    return jnp.clip(0.3 * lum_mask + 2.0 * act, 0.05, 1.0)


@dataclasses.dataclass(frozen=True)
class SyncSealConfig:
    image_size: int = 256
    scaling_w: float = 0.4  # embedding strength (reference scaling_w)


class SyncSealModel:
    """embed / detect / unwarp / forward (training) — the reference's
    ``SyncModel`` + ``SyncModelJIT`` API surface."""

    def __init__(self, embedder_params, extractor_params, cfg: SyncSealConfig = SyncSealConfig(),
                 embedder: Optional[ConvNeXtEmbedder] = None,
                 extractor: Optional[ViTExtractor] = None):
        self.cfg = cfg
        self.embedder = embedder or ConvNeXtEmbedder()
        self.extractor = extractor or ViTExtractor()
        self.embedder_params = embedder_params
        self.extractor_params = extractor_params

    @staticmethod
    def init(rng: jax.Array, cfg: SyncSealConfig = SyncSealConfig()):
        emb = ConvNeXtEmbedder()
        ext = ViTExtractor()
        x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        k1, k2 = jax.random.split(rng)
        return SyncSealModel(emb.init(k1, x), ext.init(k2, x), cfg, emb, ext)

    @staticmethod
    def load(path: str, cfg: Optional[SyncSealConfig] = None):
        import json
        import os

        from wmar_tpu.utils import checkpoint as ckpt

        meta_path = path + ".json"
        if cfg is None:
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    cfg = SyncSealConfig(**json.load(f))
            else:
                cfg = SyncSealConfig()
        model = SyncSealModel.init(jax.random.PRNGKey(0), cfg)
        state = ckpt.load_pytree(path, {"embedder": model.embedder_params,
                                        "extractor": model.extractor_params})
        return SyncSealModel(state["embedder"], state["extractor"], cfg,
                             model.embedder, model.extractor)

    def save(self, path: str):
        import dataclasses as _dc
        import json

        from wmar_tpu.utils import checkpoint as ckpt

        ckpt.save_pytree(path, {"embedder": self.embedder_params,
                                "extractor": self.extractor_params})
        with open(path + ".json", "w") as f:
            json.dump(_dc.asdict(self.cfg), f)

    # -- inference API (imgs in [-1, 1] NHWC, matching the SyncManager) ----

    def embed_params(self, embedder_params, imgs01):
        delta = self.embedder.apply(embedder_params, imgs01)
        att = jnd_heatmap(imgs01)
        out = imgs01 + self.cfg.scaling_w * att * delta
        # 8-bit rounding with straight-through grads (sync_model.py:177-240)
        q = jnp.round(jnp.clip(out, 0, 1) * 255.0) / 255.0
        return out + jax.lax.stop_gradient(q - out)

    def add_sync(self, imgs):
        out01 = self.embed_params(self.embedder_params, (imgs + 1.0) / 2.0)
        return jnp.clip(out01 * 2.0 - 1.0, -1.0, 1.0)

    def detect_params(self, extractor_params, imgs01):
        return self.extractor.apply(extractor_params, imgs01)  # [B, 4, 2]

    def detect(self, imgs):
        return self.detect_params(self.extractor_params, (imgs + 1.0) / 2.0)

    def remove_sync(self, imgs):
        corners = self.detect(imgs)
        out01 = unwarp_from_corners((imgs + 1.0) / 2.0, corners)
        return jnp.clip(out01 * 2.0 - 1.0, -1.0, 1.0)


# ---------------------------------------------------------------------------
# Geometric augmenter with ground-truth corner points
# ---------------------------------------------------------------------------


def random_corner_homography(rng: jax.Array, strength: float = 0.25):
    """Sample target corner positions (normalized) = a random perspective /
    rotation / crop, as the reference's GeometricAugmenter does with
    ``startpoints`` ground truth (``augmentation/geometricunified.py``)."""
    k1, k2 = jax.random.split(rng)
    jitter = jax.random.uniform(k1, (4, 2), minval=-strength, maxval=strength)
    # jitter pulls corners inward/outward around the frame
    corners = jnp.asarray(CANON_CORNERS) + jitter * jnp.asarray(
        [[1, 1], [-1, 1], [1, -1], [-1, -1]], jnp.float32
    )
    # corners[i] tracks where ORIGINAL corner i lands; a horizontal flip
    # sends x -> 1-x with no reordering.
    flip = jax.random.uniform(k2) < 0.25
    flipped = corners.at[:, 0].set(1.0 - corners[:, 0])
    return jnp.where(flip, flipped, corners)


def apply_corner_warp(imgs01: jnp.ndarray, corners: jnp.ndarray) -> jnp.ndarray:
    """Warp so the canonical frame corners land at ``corners`` ([B, 4, 2]
    normalized). Inverse-warp convention of ``warp_perspective``."""
    b, h, w, _ = imgs01.shape
    canon_px = jnp.asarray(CANON_CORNERS) * jnp.asarray([w - 1.0, h - 1.0])
    dst_px = corners * jnp.asarray([w - 1.0, h - 1.0])
    # inverse-warp: output pixel p (in the attacked frame) samples the source
    # at H(p) where H maps dst corners -> canonical corners.
    h_inv = solve_homography(dst_px, jnp.tile(canon_px[None], (b, 1, 1)))
    return warp_perspective(imgs01, h_inv)


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


def make_train_step(model: SyncSealModel, optimizer, perceptual=None, corner_weight: float = 5.0):
    """Corner MAE + perceptual drift, mirroring ``losses/sync_loss.py``
    (GAN term omitted in round 1)."""
    from wmar_tpu.finetune.perceptual import PerceptualLoss

    perceptual = perceptual or PerceptualLoss()

    def loss_fn(params, imgs01, rng):
        k_geo, k_noise = jax.random.split(rng)
        embedded = model.embed_params(params["embedder"], imgs01)
        p_loss = perceptual(imgs01 * 2 - 1, embedded * 2 - 1).mean()
        # valuemetric aug (noise) then geometric warp with known corners
        noisy = jnp.clip(embedded + jax.random.normal(k_noise, embedded.shape) * 0.02, 0, 1)
        b = imgs01.shape[0]
        corners = jax.vmap(lambda k: random_corner_homography(k))(
            jax.random.split(k_geo, b)
        )
        warped = apply_corner_warp(noisy, corners)
        pred = model.detect_params(params["extractor"], warped)
        corner_mae = jnp.abs(pred - corners).mean()
        loss = p_loss + corner_weight * corner_mae
        return loss, {"loss": loss, "perceptual": p_loss, "corner_mae": corner_mae}

    def train_step(state, imgs01, rng):
        params, opt_state = state
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, imgs01, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return (params, opt_state), metrics

    return train_step


def evaluate_sync(model: SyncSealModel, imgs01, rng, strengths=(0.05, 0.15, 0.25)):
    """Corner-error eval grid (the reference's ``evals/eval_sync.py``):
    embed, warp by known corners at several strengths, detect, report
    mean corner error (normalized units) and embedding PSNR."""
    import numpy as np

    embedded = model.embed_params(model.embedder_params, imgs01)
    mse = float(jnp.mean((embedded - imgs01) ** 2))
    psnr = float(10 * np.log10(1.0 / max(mse, 1e-12)))
    rows = []
    b = imgs01.shape[0]
    for si, s in enumerate(strengths):
        corners = jax.vmap(lambda k: random_corner_homography(k, strength=s))(
            jax.random.split(jax.random.fold_in(rng, si), b)
        )
        warped = apply_corner_warp(embedded, corners)
        pred = model.detect_params(model.extractor_params, warped)
        err = float(jnp.abs(pred - corners).mean())
        rows.append({"strength": s, "corner_mae": err})
    return {"psnr": psnr, "grid": rows}
