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


# ---------------------------------------------------------------------------
# Reference-spec model (exact UNet embedder + ConvNeXtV2 extractor)
# ---------------------------------------------------------------------------

# torchvision perspective corner order (geometricunified.py startpoints)
TV_CORNERS = np.asarray(
    [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]], dtype=np.float32
)  # TL TR BR BL, normalized (x, y)


class SyncSealRef:
    """The reference's shipped SyncModel: unet_small2_yuv embedder on the Y
    channel + convnext_tiny extractor predicting (detect logit, 8 corner
    coords in [-1, 1], TL TR BR BL order), jnd_1_1 attenuation, scaling_w
    blend, 8-bit ST rounding (``syncseal/models/sync_model.py:84-270``)."""

    def __init__(self, unet_params, convnext_params, cfg: "SyncSealConfig" = None,
                 unet_cfg=None, convnext_cfg=None):
        from wmar_tpu.sync import syncseal_models as sm

        self.cfg = cfg or SyncSealConfig(scaling_w=0.2)
        self.unet_cfg = unet_cfg or sm.UNET_SMALL2_YUV
        self.convnext_cfg = convnext_cfg or sm.CONVNEXT_TINY
        self.unet_params = jax.tree.map(jnp.asarray, unet_params)
        self.convnext_params = jax.tree.map(jnp.asarray, convnext_params)

    @staticmethod
    def init(seed: int = 0, cfg=None, unet_cfg=None, convnext_cfg=None):
        from wmar_tpu.sync import syncseal_models as sm

        unet_cfg = unet_cfg or sm.UNET_SMALL2_YUV
        convnext_cfg = convnext_cfg or sm.CONVNEXT_TINY
        return SyncSealRef(
            sm.init_unet_params(seed, unet_cfg),
            sm.init_convnext_params(seed + 1, convnext_cfg),
            cfg, unet_cfg, convnext_cfg,
        )

    @staticmethod
    def load_torch(ckpt_path: str, cfg=None):
        """Load the released (non-TorchScript) state dict: embedder.unet.* +
        extractor.{convnext,head}.* keys."""
        from wmar_tpu.sync import syncseal_models as sm
        from wmar_tpu.utils.convert import load_torch_state_dict

        sd = load_torch_state_dict(ckpt_path)
        unet_prefix = "embedder.unet." if any(k.startswith("embedder.unet.") for k in sd) else "unet."
        cn_prefix = "extractor.convnext." if any(k.startswith("extractor.") for k in sd) else "convnext."
        hd_prefix = cn_prefix.replace("convnext.", "head.")
        return SyncSealRef(
            sm.convert_unet(sd, prefix=unet_prefix),
            sm.convert_convnext(sd, prefix=cn_prefix, head_prefix=hd_prefix),
            cfg,
        )

    # -- core fns (params explicit for training) ---------------------------

    def embed01(self, unet_params, imgs01, scaling_w=None):
        from wmar_tpu.sync import syncseal_models as sm
        from wmar_tpu.sync.wam_exact import jnd_heatmaps

        sw = self.cfg.scaling_w if scaling_w is None else scaling_w
        y = sm.rgb_to_yuv(imgs01)[..., :1]
        delta = sm.unet_forward(unet_params, self.unet_cfg, y * 2.0 - 1.0)
        imgs_w = imgs01 + sw * delta  # scaling_i=1.0, 1ch delta broadcast
        # jnd_1_1 attenuation: imgs + hmaps * (imgs_w - imgs) on luminance
        hmaps = jnd_heatmaps(imgs01, blue=False)[..., :1]
        imgs_w = imgs01 + hmaps * (imgs_w - imgs01)
        imgs_w = jnp.clip(imgs_w, 0.0, 1.0)
        q = jnp.round(imgs_w * 255.0) / 255.0  # 8-bit ST rounding
        return imgs_w + jax.lax.stop_gradient(q - imgs_w)

    def detect01(self, convnext_params, imgs01):
        from wmar_tpu.sync import syncseal_models as sm

        return sm.convnext_forward(convnext_params, self.convnext_cfg, imgs01 * 2.0 - 1.0)

    # -- SyncManager interface ([-1,1] images) ------------------------------

    def add_sync(self, imgs):
        out01 = self.embed01(self.unet_params, (imgs + 1.0) / 2.0)
        return jnp.clip(out01 * 2.0 - 1.0, -1.0, 1.0)

    def remove_sync(self, imgs):
        preds = self.detect01(self.convnext_params, (imgs + 1.0) / 2.0)
        corners01 = (preds[:, 1:].reshape(-1, 4, 2) + 1.0) / 2.0  # [-1,1] -> [0,1]
        # TV order TL TR BR BL -> solver order TL TR BL BR
        corners01 = corners01[:, jnp.asarray([0, 1, 3, 2])]
        out01 = unwarp_from_corners((imgs + 1.0) / 2.0, corners01)
        return jnp.clip(out01 * 2.0 - 1.0, -1.0, 1.0)

    def save(self, path: str):
        from wmar_tpu.utils import checkpoint as ckpt

        ckpt.save_pytree(path, {"unet": self.unet_params, "convnext": self.convnext_params})

    @staticmethod
    def load(path: str, cfg=None):
        from wmar_tpu.utils import checkpoint as ckpt

        model = SyncSealRef.init(0, cfg)
        state = ckpt.load_pytree(path, {"unet": model.unet_params,
                                        "convnext": model.convnext_params})
        return SyncSealRef(state["unet"], state["convnext"], cfg)


# ---------------------------------------------------------------------------
# Training to the reference spec (train_sync.py:250-405)
# ---------------------------------------------------------------------------


def valuemetric_branches():
    """The in-training valuemetric bank (syncseal/augmentation/valuemetric.py),
    one jittable branch per family for per-image ``lax.switch``. Parametric
    families use a few discrete strengths (jit needs static params)."""
    from wmar_tpu.augmentations import valuemetric as V

    return [
        lambda x, r: x,  # identity
        lambda x, r: V.jpeg_diff(x, 60),
        lambda x, r: V.jpeg_diff(x, 85),
        lambda x, r: V.gaussian_blur(x, 5),
        lambda x, r: V.median_filter(x, 3),
        lambda x, r: jnp.clip(V.brightness(x, 1.5), 0, 1),
        lambda x, r: V.contrast(x, 1.5),
        lambda x, r: V.saturation(x, 1.5),
        lambda x, r: V.hue(x, 0.1),
        lambda x, r: V.gaussian_noise(x, 0.05, r),
        lambda x, r: V.grayscale(x),
    ]


def sample_geometric_corners(rng: jax.Array, perspective_strength: float = 0.25,
                             probs=None):
    """Sample one geometric aug as target corner positions in [0,1]x[0,1]
    TV order — identity / rotation / zoom-crop / perspective / hflip, the
    families of ``syncseal/augmentation/geometricunified.py:41-349``.
    ``probs`` (static, len 5) weights the family choice — fed from
    ``all_augs.yaml`` via ``configs.load_augs_config``; None = uniform."""
    k_type, k1, k2 = jax.random.split(rng, 3)
    canon = jnp.asarray(TV_CORNERS)
    center = jnp.asarray([0.5, 0.5])

    def ident():
        return canon

    def rot():
        theta = jax.random.uniform(k1, minval=-np.pi / 6, maxval=np.pi / 6)
        c, s = jnp.cos(theta), jnp.sin(theta)
        rm = jnp.asarray([[c, -s], [s, c]])
        return (canon - center) @ rm.T + center

    def crop():
        f = jax.random.uniform(k1, minval=0.5, maxval=0.95)
        # zoom-in: original corners move outside the frame by 1/f
        return (canon - center) / f + center

    def persp():
        jitter = jax.random.uniform(k1, (4, 2), minval=-perspective_strength,
                                    maxval=perspective_strength)
        inward = jnp.asarray([[1, 1], [-1, 1], [-1, -1], [1, -1]], jnp.float32)
        return canon + jitter * inward

    def flip():
        return canon.at[:, 0].set(1.0 - canon[:, 0])

    if probs is None:
        t = jax.random.randint(k_type, (), 0, 5)
    else:
        t = jax.random.choice(k_type, 5, (), p=jnp.asarray(probs, jnp.float32))
    return jax.lax.switch(t, [ident, rot, crop, persp, flip])


def apply_tv_corner_warp(imgs01: jnp.ndarray, corners: jnp.ndarray) -> jnp.ndarray:
    """Warp so canonical TV-order corners land at ``corners`` ([B,4,2], [0,1])."""
    order = jnp.asarray([0, 1, 3, 2])  # TV -> solver (TL TR BL BR)
    return apply_corner_warp(imgs01, corners[:, order])


@dataclasses.dataclass
class RefTrainConfig:
    scaling_w: float = 0.2
    scaling_w_min: Optional[float] = None  # linear schedule target
    schedule_epochs: int = 100
    lambda_i: float = 1.0  # perceptual
    lambda_d: float = 1.0  # GAN
    lambda_det: float = 1.0  # detection BCE
    lambda_sync: float = 10.0  # corner regression
    disc_start: int = 0
    finetune_detector_start: int = 10**9


def scaling_w_at(cfg: RefTrainConfig, epoch: int) -> float:
    """Linear scaling_w schedule (uoptim.ScalingScheduler semantics)."""
    if cfg.scaling_w_min is None:
        return cfg.scaling_w
    t = min(max(epoch, 0), cfg.schedule_epochs) / cfg.schedule_epochs
    return cfg.scaling_w + t * (cfg.scaling_w_min - cfg.scaling_w)


def make_ref_train_steps(model: SyncSealRef, optimizer, optimizer_d,
                         cfg: RefTrainConfig = RefTrainConfig(), perceptual=None,
                         aug_weights=None):
    """Two train steps mirroring ``SyncLoss.forward`` optimizer_idx 0/1:

    * model step: perceptual + hinge-G + detect BCE + corner MSE (preds in
      [-1,1] TV order), through the full valuemetric bank (per-image
      ``lax.switch``) + geometric corner warp.
    * disc step: hinge D on (real, fake.detach()).

    ``detector_only`` freezes the embedder and zeroes percep/GAN terms
    (train_sync.py:390-405). ``scaling_w``/``disc_factor`` are traced args
    so schedules don't recompile. ``aug_weights`` (a ``configs.AugWeights``
    from ``all_augs.yaml``) reweights the per-image aug sampling; None =
    uniform over both banks.
    """
    import optax

    from wmar_tpu.finetune.perceptual import PerceptualLoss

    perceptual = perceptual or PerceptualLoss()
    branches = valuemetric_branches()
    vm_probs = (None if aug_weights is None
                else jnp.asarray(aug_weights.valuemetric, jnp.float32))
    geo_probs = None if aug_weights is None else aug_weights.geometric

    def forward(params, imgs01, rng, scaling_w):
        k_aug, k_type, k_geo = jax.random.split(rng, 3)
        imgs_w = model.embed01(params["unet"], imgs01, scaling_w)
        b = imgs01.shape[0]
        if vm_probs is None:
            aug_ids = jax.random.randint(k_type, (b,), 0, len(branches))
        else:
            aug_ids = jax.random.choice(k_type, len(branches), (b,), p=vm_probs)
        aug_keys = jax.random.split(k_aug, b)

        def aug_one(img, aid, k):
            return jax.lax.switch(aid, branches, img[None], k)[0]

        imgs_aug = jax.vmap(aug_one)(imgs_w, aug_ids, aug_keys)
        corners = jax.vmap(
            lambda k: sample_geometric_corners(k, probs=geo_probs)
        )(jax.random.split(k_geo, b))
        imgs_aug = apply_tv_corner_warp(imgs_aug, corners)
        preds = model.detect01(params["convnext"], imgs_aug)
        target = (corners.reshape(b, 8) * 2.0 - 1.0)  # [0,1] -> [-1,1]
        return imgs_w, preds, target

    def model_loss(params, disc_params, imgs01, rng, scaling_w, disc_factor,
                   detector_only):
        from wmar_tpu.sync import syncseal_models as sm

        unet_p = jax.lax.cond(
            detector_only,
            lambda p: jax.tree.map(jax.lax.stop_gradient, p),
            lambda p: p,
            params["unet"],
        )
        imgs_w, preds, target = forward(
            {"unet": unet_p, "convnext": params["convnext"]}, imgs01, rng, scaling_w
        )
        active = jnp.where(detector_only, 0.0, 1.0)
        p_loss = perceptual(imgs01 * 2 - 1, imgs_w * 2 - 1).mean()
        logits_fake = sm.discriminator_forward(disc_params, imgs_w)
        g_loss = -logits_fake.mean()
        det_loss = optax.sigmoid_binary_cross_entropy(
            preds[:, 0], jnp.ones_like(preds[:, 0])
        ).mean()
        sync_loss = ((preds[:, 1:] - target) ** 2).mean()
        total = (cfg.lambda_i * active * p_loss
                 + cfg.lambda_d * active * disc_factor * g_loss
                 + cfg.lambda_det * det_loss
                 + cfg.lambda_sync * sync_loss)
        return total, {"loss": total, "percep": p_loss, "gan_g": g_loss,
                       "detect": det_loss, "transform": sync_loss}

    def disc_loss(disc_params, params, imgs01, rng, scaling_w, disc_factor):
        from wmar_tpu.sync import syncseal_models as sm

        imgs_w = model.embed01(params["unet"], imgs01, scaling_w)
        imgs_w = jax.lax.stop_gradient(imgs_w)
        logits_real = sm.discriminator_forward(disc_params, imgs01)
        logits_fake = sm.discriminator_forward(disc_params, imgs_w)
        d = disc_factor * sm.hinge_d_loss(logits_real, logits_fake)
        return d, {"disc_loss": d, "logits_real": logits_real.mean(),
                   "logits_fake": logits_fake.mean()}

    def model_step(state, imgs01, rng, scaling_w, disc_factor, detector_only):
        params, opt_state, disc_params, _ = state
        (_, metrics), grads = jax.value_and_grad(model_loss, has_aux=True)(
            params, disc_params, imgs01, rng, scaling_w, disc_factor, detector_only
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, disc_params, state[3]), metrics

    def disc_step(state, imgs01, rng, scaling_w, disc_factor):
        params, opt_state, disc_params, disc_opt_state = state
        (_, metrics), grads = jax.value_and_grad(disc_loss, has_aux=True)(
            disc_params, params, imgs01, rng, scaling_w, disc_factor
        )
        updates, disc_opt_state = optimizer_d.update(grads, disc_opt_state, disc_params)
        disc_params = optax.apply_updates(disc_params, updates)
        return (params, opt_state, disc_params, disc_opt_state), metrics

    return model_step, disc_step


def init_ref_train_state(model: SyncSealRef, optimizer, optimizer_d, seed: int = 0):
    from wmar_tpu.sync import syncseal_models as sm

    params = {"unet": model.unet_params, "convnext": model.convnext_params}
    disc_params = jax.tree.map(
        lambda x: x if isinstance(x, int) else jnp.asarray(x),
        sm.init_discriminator_params(seed),
    )
    return (params, optimizer.init(params), disc_params, optimizer_d.init(disc_params))


# ---------------------------------------------------------------------------
# Eval (evals/eval_sync.py grid: corner error + PSNR/SSIM/LPIPS + baselines)
# ---------------------------------------------------------------------------


def ssim(a01: jnp.ndarray, b01: jnp.ndarray, window: int = 11, sigma: float = 1.5):
    """Standard single-scale SSIM over [0,1] NHWC images."""
    half = window // 2
    x = jnp.arange(window, dtype=jnp.float32) - half
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    k2d = (g[:, None] * g[None, :] / (g.sum() ** 2))[:, :, None, None]
    dn = ("NHWC", "HWIO", "NHWC")

    def filt(v):
        c = v.shape[-1]
        k = jnp.tile(k2d, (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            v, k, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
        )

    mu_a, mu_b = filt(a01), filt(b01)
    saa = filt(a01 * a01) - mu_a**2
    sbb = filt(b01 * b01) - mu_b**2
    sab = filt(a01 * b01) - mu_a * mu_b
    c1, c2 = 0.01**2, 0.03**2
    s = ((2 * mu_a * mu_b + c1) * (2 * sab + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (saa + sbb + c2)
    )
    return s.mean(axis=(1, 2, 3))


def sift_ransac_corners(orig01: np.ndarray, attacked01: np.ndarray):
    """SIFT+RANSAC baseline (``syncseal/models/sync_model.py:273-360``):
    estimate the homography original->attacked and return where the original
    frame corners land (normalized [0,1], TV order). None if not enough
    matches. Host-side OpenCV."""
    import cv2

    def to_u8(x):
        return np.clip(np.asarray(x) * 255.0, 0, 255).astype(np.uint8)

    g1 = cv2.cvtColor(to_u8(orig01), cv2.COLOR_RGB2GRAY)
    g2 = cv2.cvtColor(to_u8(attacked01), cv2.COLOR_RGB2GRAY)
    sift = cv2.SIFT_create()
    kp1, des1 = sift.detectAndCompute(g1, None)
    kp2, des2 = sift.detectAndCompute(g2, None)
    if des1 is None or des2 is None or len(kp1) < 4 or len(kp2) < 4:
        return None
    matcher = cv2.BFMatcher()
    matches = matcher.knnMatch(des1, des2, k=2)
    good = [m for m, n in matches if m.distance < 0.75 * n.distance]
    if len(good) < 4:
        return None
    src = np.float32([kp1[m.queryIdx].pt for m in good]).reshape(-1, 1, 2)
    dst = np.float32([kp2[m.trainIdx].pt for m in good]).reshape(-1, 1, 2)
    H, _ = cv2.findHomography(src, dst, cv2.RANSAC, 5.0)
    if H is None:
        return None
    h, w = g1.shape
    corners_px = np.float32([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]]).reshape(-1, 1, 2)
    mapped = cv2.perspectiveTransform(corners_px, H).reshape(4, 2)
    return mapped / np.float32([w - 1, h - 1])


def evaluate_sync_ref(model: SyncSealRef, imgs01, rng, perceptual=None,
                      with_sift_baseline: bool = True):
    """The reference's ``evals/eval_sync.py`` grid: embed, attack with
    geometric x valuemetric combos, detect, report corner error per cell
    plus embedding PSNR/SSIM/LPIPS and the SIFT+RANSAC baseline."""
    from wmar_tpu.augmentations import valuemetric as V

    imgs_w = model.embed01(model.unet_params, imgs01)
    mse = float(jnp.mean((imgs_w - imgs01) ** 2))
    quality = {
        "psnr": float(10 * np.log10(1.0 / max(mse, 1e-12))),
        "ssim": float(ssim(imgs_w, imgs01).mean()),
    }
    if perceptual is not None:
        quality["lpips"] = float(perceptual(imgs01 * 2 - 1, imgs_w * 2 - 1).mean())

    b = imgs01.shape[0]
    valuemetrics = [("none", lambda x: x),
                    ("jpeg60", lambda x: V.jpeg_diff(x, 60)),
                    ("blur5", lambda x: V.gaussian_blur(x, 5)),
                    ("noise05", lambda x: V.gaussian_noise(x, 0.05, jax.random.PRNGKey(7)))]
    rows = []
    for gi, strength in enumerate((0.05, 0.15, 0.25)):
        corners = jax.vmap(
            lambda k: sample_geometric_corners(k, perspective_strength=strength)
        )(jax.random.split(jax.random.fold_in(rng, gi), b))
        target = corners.reshape(b, 8) * 2.0 - 1.0
        for vname, vfn in valuemetrics:
            attacked = apply_tv_corner_warp(jnp.clip(vfn(imgs_w), 0, 1), corners)
            preds = model.detect01(model.convnext_params, attacked)
            err = float(jnp.abs(preds[:, 1:] - target).mean())
            row = {"strength": strength, "valuemetric": vname, "corner_mae": err}
            if with_sift_baseline:
                errs = []
                for i in range(b):
                    est = sift_ransac_corners(np.asarray(imgs_w[i]), np.asarray(attacked[i]))
                    if est is not None:
                        errs.append(np.abs(est * 2 - 1 - np.asarray(target[i]).reshape(4, 2)).mean())
                row["sift_corner_mae"] = float(np.mean(errs)) if errs else None
            rows.append(row)
    return {"quality": quality, "grid": rows}


def wam_corner_baseline(wam_sync, imgs, image_size: int = 256) -> np.ndarray:
    """WAM-based corner baseline (``syncseal/models/sync_model.py:363-448``
    WAMSyncModel.detect): turn WamSync's (rotation, cut_i, cut_j, flip)
    estimate into the 8 corner coordinates normalized to [-1, 1], TV order.

    ``wam_sync``: a ``wam_logic.WamSync`` (e.g. over ``wam_exact.WamExact``);
    ``imgs``: [-1, 1] NHWC batch of sync-embedded, attacked images.
    """
    b, H, W, _ = imgs.shape
    s = image_size
    out = np.zeros((b, 8), np.float32)
    img01 = (np.asarray(imgs) + 1.0) / 2.0
    for i in range(b):
        (angle, cuti, cutj, flipped), _ = wam_sync.estimate(jnp.asarray(img01[i]))
        cuti = min(max(int(cuti), 0), s - 1)
        cutj = min(max(int(cutj), 0), s - 1)
        crop_applied = (cuti != (s - 1) // 2 or cutj != (s - 1) // 2) and not flipped
        corners = np.array([[0, 0], [W - 1, 0], [W - 1, H - 1], [0, H - 1]], np.float32)
        cuti = int((H - 1) * cuti / (s - 1))
        cutj = int((W - 1) * cutj / (s - 1))
        if crop_applied:
            pad_i = 2 * cuti - (H - 1)
            pad_j = 2 * cutj - (W - 1)
            corners = np.array(
                [[0, 0], [(W - 1) - pad_j, 0],
                 [(W - 1) - pad_j, (H - 1) - pad_i], [0, (H - 1) - pad_i]], np.float32
            )
        if abs(angle) > 1e-2:
            center = np.array([W / 2, H / 2])
            theta = -np.deg2rad(angle)
            rot = np.array([[np.cos(theta), -np.sin(theta)],
                            [np.sin(theta), np.cos(theta)]])
            corners = (corners - center) @ rot.T + center
        if flipped:
            corners[:, 0] = W - 1 - corners[:, 0]
        out[i] = ((corners - np.array([W / 2, H / 2])) / np.array([W / 2, H / 2])).reshape(8)
    return out


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
