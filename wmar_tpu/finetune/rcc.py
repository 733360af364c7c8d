"""Reverse-cycle-consistency (RCC) tokenizer finetuning, mesh-parallel.

Re-implements the reference's ``finetune.py`` + patched ``VQModel.forward``
(``deps/taming/models/vqgan.py:86-169``): starting from precomputed codes,

  z_q = embed(codes)
  xrec = decoder(z_q)                 # trainable decoder
  xrec_orig = orig_decoder(z_q)       # frozen original
  drift = L1(xrec_orig, xrec) + perceptual(xrec_orig, xrec)   # GAN disabled
  x_aug = random_augmentation(xrec)   # grads flow; JPEG straight-through
  zrec = quant_conv(watermark_encoder(x_aug))   # trainable encoder clone
  idem = masked_mse(z_q, zrec)        # rotation/crop masks (:140-154)
  loss = drift + w * idem

TPU-native differences: the random augmentation is a `lax.switch` over the
static (class, param) grid (every reference finetune aug has finite discrete
params, ``finetune.py:323-350``) so the whole step jits; data parallelism is
a `Mesh` + NamedSharding batch shard (replicated params, XLA inserts the
gradient all-reduce) instead of DDP/NCCL; the aug curriculum
(warmup/weak/medium/strong, ``--augs_schedule``) is preserved.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from wmar_tpu.augmentations import geometric as G
from wmar_tpu.augmentations import valuemetric as V
from wmar_tpu.finetune.perceptual import PerceptualLoss

# ---------------------------------------------------------------------------
# Train-time augmentation bank (static branches + idempotence masks)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AugBranch:
    name: str
    param: float
    fn: Callable[[jnp.ndarray, jax.Array], jnp.ndarray]  # [0,1] -> [0,1]
    mask_kind: str = "full"  # full | rotate | croppad


# The reference's curriculum levels (``finetune.py:323-350``).
AUG_LEVELS: dict = {
    "warmup": [],
    "weak": [
        ("jpeg", [90, 80, 70]),
        ("blur", [1, 3]),
        ("noise", [0.005, 0.01, 0.015, 0.02]),
        ("brightness", [1.0, 1.1, 1.2]),
        ("rotate", [-1, 1]),
        ("croppad", [0.8, 0.9]),
    ],
    "medium": [
        ("jpeg", [80, 60, 40]),
        ("blur", [3, 5]),
        ("noise", [0.02, 0.04, 0.06]),
        ("brightness", [1.2, 1.3, 1.4]),
        ("rotate", [-3, -2, -1, 1, 2, 3]),
        ("croppad", [0.5, 0.6, 0.7, 0.8, 0.9]),
    ],
    "strong": [
        ("jpeg", [40, 30, 20]),
        ("blur", [5, 7, 9]),
        ("noise", [0.06, 0.08, 0.1]),
        ("brightness", [1.4, 1.7, 2.0]),
        ("rotate", [-3, -2, -1, 1, 2, 3]),
        ("croppad", [0.5, 0.6, 0.7, 0.8, 0.9]),
    ],
}


def _make_branch(name: str, param: float) -> AugBranch:
    if name == "jpeg":
        return AugBranch(name, param, lambda x, k, q=int(param): V.jpeg_diff(x, q))
    if name == "blur":
        return AugBranch(name, param, lambda x, k, ks=int(param): V.gaussian_blur(x, ks))
    if name == "noise":
        return AugBranch(name, param, lambda x, k, s=float(param): V.gaussian_noise(x, s, k))
    if name == "brightness":
        return AugBranch(name, param, lambda x, k, f=float(param): V.brightness(x, f))
    if name == "rotate":
        return AugBranch(name, param, lambda x, k, a=float(param): G.rotate(x, a), "rotate")
    if name == "croppad":
        return AugBranch(
            name, param, lambda x, k, f=float(param): G.upper_left_crop_pad_back(x, f), "croppad"
        )
    raise ValueError(name)


def expand_level(level: str) -> List[AugBranch]:
    """Flatten a curriculum level into (class, param) branches, with branch
    probabilities matching the reference's two-stage uniform choice."""
    return [
        _make_branch(name, p) for name, params in AUG_LEVELS[level] for p in params
    ]


def _branch_logits(level: str) -> np.ndarray:
    """Log-probs so that class choice is uniform, then param uniform."""
    entries = AUG_LEVELS[level]
    n_cls = len(entries)
    probs = []
    for _, params in entries:
        probs += [1.0 / (n_cls * len(params))] * len(params)
    return np.log(np.asarray(probs, dtype=np.float32))


def _latent_mask(branch: AugBranch, side: int) -> np.ndarray:
    m = np.ones((side, side), dtype=np.float32)
    if branch.mask_kind == "rotate":
        skip = side // 8
        if skip:
            m[:] = 0.0
            m[skip:-skip, skip:-skip] = 1.0
    elif branch.mask_kind == "croppad":
        cutoff = int(np.floor(side * branch.param))
        m[:] = 0.0
        m[:cutoff, :cutoff] = 1.0
    return m


def apply_random_augmentation(
    x01: jnp.ndarray,
    branches: Sequence[AugBranch],
    branch_logits: np.ndarray,
    latent_side: int,
    rng: jax.Array,
    p: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Jittable version of ``wmar/utils/utils.py:25-44``.

    Returns ``(maybe-augmented images [0,1], latent idempotence mask [s,s])``.
    """
    if not branches:
        return x01, jnp.ones((latent_side, latent_side), jnp.float32)
    k_gate, k_pick, k_aug = jax.random.split(rng, 3)
    masks = jnp.asarray(np.stack([_latent_mask(b, latent_side) for b in branches]))
    idx = jax.random.categorical(k_pick, jnp.asarray(branch_logits))
    fns = [lambda x, k, b=b: b.fn(x, k) for b in branches]
    x_aug = jax.lax.switch(idx, fns, x01, k_aug)
    mask = masks[idx]
    do_aug = jax.random.uniform(k_gate) < p
    x_out = jnp.where(do_aug, x_aug, x01)
    mask = jnp.where(do_aug, mask, jnp.ones_like(mask))
    return x_out, mask


# ---------------------------------------------------------------------------
# Tokenizer adapters
# ---------------------------------------------------------------------------


class TamingRCCAdapter:
    """Plugs TamingVQGAN into the RCC loop with swapped-in trainable parts."""

    def __init__(self, model, frozen_variables):
        self.model = model
        self.frozen = frozen_variables["params"]
        self.latent_side = model.cfg.codes_per_side

    def init_trainable(self):
        """Trainable = decoder + a clone of the encoder (watermark_encoder),
        exactly the reference's ``newenc-dec`` mode (``finetune.py:296-304``)."""
        return {
            "decoder": jax.tree.map(jnp.asarray, self.frozen["decoder"]),
            "watermark_encoder": jax.tree.map(jnp.asarray, self.frozen["encoder"]),
        }

    def _vars(self, **overrides):
        p = dict(self.frozen)
        p.update(overrides)
        return {"params": p}

    def lookup(self, codes):
        b = codes.shape[0]
        s = self.latent_side
        emb = self.frozen["quantize"]["embedding"]
        return emb[codes.reshape(b, s, s)]

    def decode(self, decoder_params, z_q):
        from wmar_tpu.models.vqgan import TamingVQGAN

        return self.model.apply(
            self._vars(decoder=decoder_params), z_q, method=TamingVQGAN.decode_latent
        )

    def decode_orig(self, z_q):
        return self.decode(self.frozen["decoder"], z_q)

    def encode_latent(self, encoder_params, images):
        from wmar_tpu.models.vqgan import TamingVQGAN

        return self.model.apply(
            self._vars(encoder=encoder_params), images, method=TamingVQGAN.encode_latent
        )

    def nearest_codes(self, z):
        from wmar_tpu.models.vqgan import TamingVQGAN

        idx = self.model.apply(self._vars(), z, method=lambda m, zz: m.quantize.nearest(zz))
        return idx.reshape(idx.shape[0], -1)


class MaskGitRCCAdapter:
    """Same protocol for RAR's MaskGit tokenizer ([0,1] pixel space inside,
    mirrored from ``deps/rar/modeling/titok.py:125-208``)."""

    def __init__(self, model, frozen_variables):
        self.model = model
        self.frozen = frozen_variables["params"]
        self.latent_side = model.cfg.codes_per_side

    def init_trainable(self):
        return {
            "decoder": jax.tree.map(jnp.asarray, self.frozen["decoder"]),
            "watermark_encoder": jax.tree.map(jnp.asarray, self.frozen["encoder"]),
        }

    def _vars(self, **overrides):
        p = dict(self.frozen)
        p.update(overrides)
        return {"params": p}

    def lookup(self, codes):
        b = codes.shape[0]
        s = self.latent_side
        return self.frozen["embedding"][codes.reshape(b, s, s)]

    def decode(self, decoder_params, z_q):
        from wmar_tpu.models.maskgit_vqgan import MGDecoder

        rec01 = MGDecoder(self.model.cfg).apply({"params": decoder_params}, z_q)
        return jnp.clip(rec01, 0.0, 1.0) * 2.0 - 1.0

    def decode_orig(self, z_q):
        return self.decode(self.frozen["decoder"], z_q)

    def encode_latent(self, encoder_params, images):
        from wmar_tpu.models.maskgit_vqgan import MGEncoder

        return MGEncoder(self.model.cfg).apply({"params": encoder_params}, (images + 1.0) / 2.0)

    def nearest_codes(self, z):
        from wmar_tpu.models.maskgit_vqgan import MaskGitVQGAN

        idx = self.model.apply(self._vars(), z, method=MaskGitVQGAN.nearest)
        return idx.reshape(idx.shape[0], -1)


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class RCCState:
    step: jnp.ndarray
    trainable: dict
    opt_state: optax.OptState


@dataclasses.dataclass(frozen=True)
class RCCConfig:
    lr: float = 1e-5
    idem_weight: float = 2.0
    aug_prob: float = 0.5
    lr_decay: float = 0.9  # per-epoch StepLR gamma (``finetune.py:372``)


def make_optimizer(cfg: RCCConfig, steps_per_epoch: Optional[int] = None):
    if steps_per_epoch:
        schedule = lambda step: cfg.lr * (cfg.lr_decay ** (step // steps_per_epoch))  # noqa: E731
        return optax.adam(schedule, b1=0.9, b2=0.999)
    return optax.adam(cfg.lr, b1=0.9, b2=0.999)


def make_train_step(
    adapter,
    cfg: RCCConfig,
    level: str,
    optimizer,
    perceptual: Optional[PerceptualLoss] = None,
    gan=None,
):
    """Build the jittable train step for one curriculum level.

    ``gan``: optional :class:`wmar_tpu.finetune.gan.GanConfig` — enables the
    reference's generator-side GAN branch (``vqperceptual.py:95-113``):
    ``loss += d_weight * disc_factor * (-mean(D(xrec)))`` against a frozen
    PatchGAN discriminator, with the adaptive grad-norm ``d_weight`` taken
    on the decoder's final conv kernel. All published sweeps disable it
    (``--disable_gan``); it is here for loss-surface parity."""
    branches = expand_level(level)
    logits = _branch_logits(level) if branches else None
    perceptual = perceptual or PerceptualLoss()
    side = adapter.latent_side

    def loss_fn(trainable, codes, rng, step):
        z_q = adapter.lookup(codes)
        xrec = adapter.decode(trainable["decoder"], z_q)
        xrec_orig = jax.lax.stop_gradient(adapter.decode_orig(z_q))
        rec_l1 = jnp.abs(xrec_orig - xrec).mean()
        p_loss = perceptual(xrec_orig, xrec).mean()

        x01 = xrec / 2.0 + 0.5
        if branches:
            x_aug01, mask = apply_random_augmentation(x01, branches, logits, side, rng, cfg.aug_prob)
        else:
            x_aug01, mask = x01, jnp.ones((side, side), jnp.float32)
        zrec = adapter.encode_latent(trainable["watermark_encoder"], x_aug01 * 2.0 - 1.0)
        sq = (z_q - zrec) ** 2
        m = mask[None, :, :, None]
        idem = (sq * m).sum() / (m.sum() * sq.shape[0] * sq.shape[-1])
        loss = rec_l1 + p_loss + cfg.idem_weight * idem
        metrics = {"loss": loss, "rec_l1": rec_l1, "perceptual": p_loss, "idem": idem}

        if gan is not None:
            from wmar_tpu.finetune.gan import (
                adaptive_weight, adopt_weight, discriminator_forward,
                last_kernel, replace_last_kernel,
            )

            disc = list(gan.disc_params)
            g_loss = -jnp.mean(discriminator_forward(disc, xrec))
            # Adaptive weight: two focused backwards wrt ONLY the final
            # conv_out kernel, on a detached copy so the outer AD does not
            # differentiate through the inner grads (d_weight is detached
            # in the reference too, vqperceptual.py:77).
            dec_sg = jax.lax.stop_gradient(trainable["decoder"])
            lk = last_kernel(dec_sg)

            def nll_of_last(k):
                xr = adapter.decode(replace_last_kernel(dec_sg, k), z_q)
                return jnp.abs(xrec_orig - xr).mean() + perceptual(xrec_orig, xr).mean()

            def g_of_last(k):
                xr = adapter.decode(replace_last_kernel(dec_sg, k), z_q)
                return -jnp.mean(discriminator_forward(disc, xr))

            d_weight = adaptive_weight(jax.grad(nll_of_last)(lk),
                                       jax.grad(g_of_last)(lk), gan.disc_weight)
            disc_factor = adopt_weight(gan.disc_factor, step, gan.disc_start)
            loss = loss + d_weight * disc_factor * g_loss
            metrics.update(loss=loss, vqgan_gan_loss=g_loss,
                           vqgan_gan_weight=d_weight,
                           vqgan_gan_factor=disc_factor)
        return loss, metrics

    def train_step(state: RCCState, codes: jnp.ndarray, rng: jax.Array):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable, codes, rng, state.step
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        gnorm = optax.global_norm(grads)
        metrics = dict(metrics, grad_norm=gnorm)
        return RCCState(step=state.step + 1, trainable=trainable, opt_state=opt_state), metrics

    return train_step


def init_state(adapter, optimizer) -> RCCState:
    trainable = adapter.init_trainable()
    return RCCState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        opt_state=optimizer.init(trainable),
    )


def make_val_step(
    adapter,
    cfg: RCCConfig,
    branch: Optional[AugBranch],
    perceptual: Optional[PerceptualLoss] = None,
):
    """Jittable validation pass for one (aug, param) cell — the reference's
    ``validate()`` (``finetune.py:73-128``) runs each augmentation of the
    current epoch's curriculum with p=1.0 (plus Identity) and reports
    loss / idem loss / vqgan (drift) loss / token-mismatch L0.

    ``branch=None`` is the Identity cell."""
    perceptual = perceptual or PerceptualLoss()
    side = adapter.latent_side

    def val_step(trainable, codes, rng):
        z_q = adapter.lookup(codes)
        xrec = adapter.decode(trainable["decoder"], z_q)
        xrec_orig = adapter.decode_orig(z_q)
        rec_l1 = jnp.abs(xrec_orig - xrec).mean()
        p_loss = perceptual(xrec_orig, xrec).mean()
        x01 = xrec / 2.0 + 0.5
        if branch is not None:
            x01 = jnp.clip(branch.fn(x01, rng), 0.0, 1.0)
            mask = jnp.asarray(_latent_mask(branch, side))
        else:
            mask = jnp.ones((side, side), jnp.float32)
        zrec = adapter.encode_latent(trainable["watermark_encoder"], x01 * 2.0 - 1.0)
        sq = (z_q - zrec) ** 2
        m = mask[None, :, :, None]
        idem = (sq * m).sum() / (m.sum() * sq.shape[0] * sq.shape[-1])
        new_codes = adapter.nearest_codes(zrec)
        l0 = (new_codes != codes).astype(jnp.float32).mean()
        loss = rec_l1 + p_loss + cfg.idem_weight * idem
        return {
            "loss": loss,
            "idem_loss": idem,
            "vqgan_loss": rec_l1 + p_loss,
            "vqgan_rec_loss": rec_l1,
            "l0": l0,
        }

    return val_step


def validation_l0(adapter, trainable, codes, aug_fn=None, rng=None):
    """Decode -> (aug) -> re-encode -> token mismatch fraction (the
    reference's validate(), ``finetune.py:73-128``)."""
    z_q = adapter.lookup(codes)
    xrec = adapter.decode(trainable["decoder"], z_q)
    x01 = xrec / 2.0 + 0.5
    if aug_fn is not None:
        x01 = aug_fn(x01, rng)
    zrec = adapter.encode_latent(trainable["watermark_encoder"], x01 * 2.0 - 1.0)
    new_codes = adapter.nearest_codes(zrec)
    return (new_codes != codes).mean(axis=-1)
