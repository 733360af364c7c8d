"""Baseline watermark methods behind one embed/detect wrapper.

TPU-native rebuild of the reference's baseline bank
(``syncseal/syncseal/evals/baselines.py:16-639``): there, six post-hoc
watermarking methods (hidden / mbrs / cin / wam / trustmark / videoseal)
are opaque ``torch.jit`` checkpoints wrapped by one ``EmbedderExtractor``
that owns the shared logic — resize to the method's native size, scale the
watermark signal, optional JND attenuation, clamp, straight-through 8-bit
rounding, and the ``detect -> [B, 1+nbits]`` score convention.

Here the wrapper IS that shared logic, rebuilt in JAX over NHWC [0,1]
images; the method registry provides:

* ``wam`` / ``wam_noattenuation`` — the native :class:`~wmar_tpu.sync.
  wam_exact.WamExact` port (weight-compatible with ``wam_mit.pth``).
* ``ss`` — a self-contained spread-spectrum baseline (fixed pseudorandom
  carriers, correlation detector). It needs no checkpoint, so hermetic
  tests and the ``eval_wm`` pipeline can run end-to-end in this
  zero-egress environment; the reference has no counterpart because all
  its baselines assume downloaded weights.
* ``hidden`` — real port: the public HiDDeN architecture
  (:mod:`wmar_tpu.sync.hidden`) with a converter that reads the weights
  out of the reference's TorchScript blobs
  (``checkpoints/hidden_{encoder,decoder}_48b.pt``).
* ``mbrs`` / ``cin`` / ``trustmark`` / ``videoseal`` — their reference
  implementations are third-party TorchScript blobs whose architectures
  are not part of the reference repo; they are registered as conversion
  stubs that fail with instructions rather than silently producing
  random-weight results.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "EmbedderExtractor",
    "SpreadSpectrum",
    "build_baseline",
    "bit_accuracy",
    "pvalue",
]


# ---------------------------------------------------------------------------
# Metrics (evals/metrics.py:61-131)
# ---------------------------------------------------------------------------


def bit_accuracy(preds: jnp.ndarray, targets: jnp.ndarray,
                 threshold: float = 0.0) -> jnp.ndarray:
    """Per-item fraction of correctly decoded bits.

    ``preds [B, K]`` real scores (> threshold decodes to 1),
    ``targets [B, K]`` in {0, 1}. Mirrors ``evals/metrics.py:107-131``.
    """
    hard = (preds > threshold).astype(jnp.int32)
    return (hard == targets.astype(jnp.int32)).mean(axis=-1)


def pvalue(preds: jnp.ndarray, targets: jnp.ndarray,
           threshold: float = 0.0) -> np.ndarray:
    """One-sided binomial-test p-value of the decoded bit count under the
    null of coin-flip bits (``evals/metrics.py:61-78``)."""
    from scipy import stats

    accs = np.asarray(bit_accuracy(preds, targets, threshold))
    nbits = targets.shape[-1]
    return np.asarray([
        stats.binomtest(int(round(a * nbits)), nbits, 0.5,
                        alternative="greater").pvalue
        for a in accs
    ])


# ---------------------------------------------------------------------------
# The unified wrapper (EmbedderExtractor, baselines.py:391-556)
# ---------------------------------------------------------------------------


def _resize(imgs: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    if imgs.shape[1] == h and imgs.shape[2] == w:
        return imgs
    return jax.image.resize(imgs, (imgs.shape[0], h, w, imgs.shape[3]),
                            method="bilinear")


@dataclasses.dataclass
class EmbedderExtractor:
    """Embed/detect wrapper shared by every baseline method.

    ``embedder(imgs01 [B,S,S,3], msgs_pm1 [B,K]) -> preds_w [B,S,S,3]``
    (the raw watermark signal at the method's native size ``img_size``);
    ``detector(imgs01 [B,S,S,3]) -> [B, 1+K]`` scores (leading channel is
    the WAM-compatible mask/detection slot). The wrapper resizes in/out,
    blends ``imgs * scaling_i + preds_w * scaling_w``, applies optional JND
    attenuation, clamps, and straight-through-rounds to 8 bits — the same
    pipeline as the reference's ``EmbedderExtractor.embed``
    (``evals/baselines.py:440-498``).
    """

    embedder: Callable
    detector: Callable
    nbits: int
    attenuation: Optional[Callable] = None  # (imgs01, imgs_w01) -> imgs_w01
    scaling_w: float = 1.0
    scaling_i: float = 1.0
    img_size: int = 256
    clamp: bool = True
    rounding: bool = True

    def get_random_msg(self, rng: jax.Array, bsz: int = 1) -> jnp.ndarray:
        return jax.random.randint(rng, (bsz, self.nbits), 0, 2)

    def embed(self, imgs01: jnp.ndarray, msgs: jnp.ndarray) -> dict:
        original = imgs01.shape[1:3]
        imgs_res = _resize(imgs01, self.img_size, self.img_size)
        preds_w = self.embedder(imgs_res, 2.0 * msgs.astype(jnp.float32) - 1.0)
        preds_w = preds_w * self.scaling_w
        preds_w = _resize(preds_w, *original)
        imgs_w = imgs01 * self.scaling_i + preds_w
        if self.attenuation is not None:
            imgs_w = self.attenuation(imgs01, imgs_w)
        if self.clamp:
            imgs_w = jnp.clip(imgs_w, 0.0, 1.0)
        if self.rounding:
            q = jnp.round(imgs_w * 255.0) / 255.0
            imgs_w = imgs_w + jax.lax.stop_gradient(q - imgs_w)
        return {"msgs": msgs, "preds_w": preds_w, "imgs_w": imgs_w}

    def detect(self, imgs01: jnp.ndarray) -> dict:
        imgs_res = _resize(imgs01, self.img_size, self.img_size)
        return {"preds": self.detector(imgs_res)}


# ---------------------------------------------------------------------------
# Spread-spectrum baseline (hermetic; no checkpoint)
# ---------------------------------------------------------------------------


class SpreadSpectrum:
    """Additive spread-spectrum watermark with fixed pseudorandom carriers.

    Bit ``k`` adds ``±alpha/sqrt(K) * C_k`` where ``C_k`` is a fixed ±1
    iid carrier over the full image; detection correlates the image with
    each carrier (``score_k = mean(x * C_k)``), which cancels the host
    image exactly in expectation. This is the classical Cox-style scheme —
    weight-free, so the surrounding sync/eval pipeline can be exercised
    without any converted checkpoint.
    """

    def __init__(self, nbits: int = 48, img_size: int = 256, seed: int = 0):
        self.nbits = nbits
        self.img_size = img_size
        carriers = np.random.default_rng(seed).integers(
            0, 2, size=(nbits, img_size, img_size, 3)).astype(np.float32)
        self.carriers = jnp.asarray(2.0 * carriers - 1.0) / np.sqrt(nbits)

    def embed(self, imgs01: jnp.ndarray, msgs_pm1: jnp.ndarray) -> jnp.ndarray:
        # [B,K] x [K,S,S,3] -> [B,S,S,3]
        return jnp.einsum("bk,kxyc->bxyc", msgs_pm1, self.carriers)

    def detect(self, imgs01: jnp.ndarray) -> jnp.ndarray:
        x = imgs01 - imgs01.mean(axis=(1, 2, 3), keepdims=True)
        scores = jnp.einsum("bxyc,kxyc->bk", x, self.carriers)
        scores = scores / (self.img_size * self.img_size * 3)
        mask = jnp.abs(scores).max(axis=-1, keepdims=True)
        return jnp.concatenate([mask, scores], axis=-1)


# ---------------------------------------------------------------------------
# Registry (build_baseline, baselines.py:558-628)
# ---------------------------------------------------------------------------

_CONVERT_HINT = (
    "the reference distributes '{m}' as third-party TorchScript checkpoints "
    "(checkpoints/{files}); convert the underlying weights with "
    "tools/convert_ckpt.py and pass params_path=, or use the hermetic 'ss' "
    "baseline / the native 'wam' port"
)

_STUB_FILES = {
    "mbrs": "mbrs_256_m256_{encoder,decoder}.pt",
    "cin": "cin_nsm_{encoder,decoder}.pt",
    "trustmark": "trustmark_{encoder,decoder}_q.pt",
    "videoseal": "y_256b_img.pt",
}


def build_baseline(
    method: str,
    params_path: Optional[str] = None,
    scaling_i: float = 1.0,
    img_size: int = 256,
    clamp: bool = True,
    rounding: bool = True,
    allow_random: bool = False,
    nbits: int = 48,
    seed: int = 0,
) -> EmbedderExtractor:
    """Build a baseline by name, mirroring the reference registry's
    per-method scaling defaults (``evals/baselines.py:558-628``)."""
    if method == "ss":
        ss = SpreadSpectrum(nbits=nbits, img_size=img_size, seed=seed)
        # carriers are unit-variance; scaling_w is the per-pixel watermark
        # amplitude (default ~30 dB PSNR)
        return EmbedderExtractor(ss.embed, ss.detect, nbits=nbits,
                                 scaling_w=8.0 / 255.0, scaling_i=scaling_i,
                                 img_size=img_size, clamp=clamp,
                                 rounding=rounding)
    if method in ("wam", "wam_noattenuation"):
        from wmar_tpu.sync.wam_exact import (
            WamExact,
            init_wam_params,
            jnd_heatmaps,
        )

        if params_path:
            wam = WamExact.load(params_path)
        elif allow_random:
            wam = WamExact(init_wam_params(seed))
        else:
            raise ValueError(
                "wam baseline needs converted wam_mit.pth params "
                "(params_path=...) — random weights do not watermark; pass "
                "allow_random=True only for smoke tests")

        def wam_embed(imgs01, msgs_pm1):
            msgs01 = (msgs_pm1 + 1.0) / 2.0
            # WamExact.embed returns the finished image (its own JND +
            # scaling inside); hand the wrapper the residual signal so the
            # registry's scaling_w semantics match the reference's
            return wam.embed(imgs01, msgs01) - imgs01

        def wam_detect(imgs01):
            logits = wam.detect(imgs01)  # [B, 1+32, H, W]
            return logits.mean(axis=(2, 3))

        if method == "wam":
            scaling_w = 1.0  # JND attenuation already applied inside
        else:
            scaling_w = 0.01
        return EmbedderExtractor(wam_embed, wam_detect, nbits=32,
                                 scaling_w=scaling_w, scaling_i=scaling_i,
                                 img_size=img_size, clamp=clamp,
                                 rounding=rounding)
    if method == "hidden":
        from wmar_tpu.sync import hidden as H

        if params_path:
            # params_path: directory holding the two reference blobs, or a
            # comma-separated "encoder.pt,decoder.pt" pair. The converter
            # reads tensors out of the TorchScript archives directly.
            import os

            if "," in params_path:
                enc_path, dec_path = params_path.split(",", 1)
            else:
                enc_path = os.path.join(params_path, "hidden_encoder_48b.pt")
                dec_path = os.path.join(params_path, "hidden_decoder_48b.pt")
            enc_p, dec_p, enc_cfg, dec_cfg = H.load_hidden_torchscript(enc_path, dec_path)
        elif allow_random:
            enc_cfg = dec_cfg = H.HiddenConfig(num_bits=nbits)
            enc_p, dec_p = H.init_hidden_params(seed, enc_cfg)
        else:
            raise ValueError(
                "hidden baseline needs the reference's TorchScript blobs "
                "(params_path=checkpoints/ or 'enc.pt,dec.pt') — random "
                "weights do not watermark; pass allow_random=True only for "
                "smoke tests")
        enc_p = jax.tree.map(jnp.asarray, enc_p)
        dec_p = jax.tree.map(jnp.asarray, dec_p)

        def hidden_embed(imgs01, msgs_pm1):
            # BaselineHiddenEmbedder.forward (baselines.py:32-48): normalize,
            # encode, multiply back by the channel stds. NOTE the reference
            # returns the full de-normalized output (not a residual) — the
            # wrapper's scaling_w=0.2 applies to that, mirrored here.
            out = H.hidden_encoder_forward(enc_p, enc_cfg, H.normalize(imgs01), msgs_pm1)
            return H.denormalize_signal(out)

        def hidden_detect(imgs01):
            msgs = H.hidden_decoder_forward(dec_p, dec_cfg, H.normalize(imgs01))
            return jnp.concatenate(
                [jnp.zeros((msgs.shape[0], 1), msgs.dtype), msgs], axis=-1)

        return EmbedderExtractor(hidden_embed, hidden_detect,
                                 nbits=enc_cfg.num_bits,
                                 scaling_w=0.2,  # registry default (:573)
                                 scaling_i=scaling_i, img_size=img_size,
                                 clamp=clamp, rounding=rounding)
    if method in _STUB_FILES:
        raise NotImplementedError(
            _CONVERT_HINT.format(m=method, files=_STUB_FILES[method]))
    raise ValueError(f"Unknown baseline method: {method}")
