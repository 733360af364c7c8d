"""GAN branch of the taming ``VQLPIPSWithDiscriminator`` for RCC finetuning.

The reference's RCC trainer builds its loss from the VQGAN checkpoint's
``VQLPIPSWithDiscriminator`` (``deps/taming/modules/losses/vqperceptual.py:33``),
which — unless ``--disable_gan`` (``finetune.py:145,288-291``; all six
published sweeps pass it) — adds ``d_weight * disc_factor * g_loss`` to the
generator objective:

* ``g_loss = -mean(D(xrec))`` against the checkpoint's trained PatchGAN
  discriminator (``deps/taming/modules/discriminator/model.py:17-67``),
  which stays FROZEN during RCC: ``finetune.py`` only optimizes
  encoder/decoder and always calls the loss with ``optimizer_idx=0``.
* ``d_weight`` is the adaptive grad-norm ratio
  ``||∂nll/∂last|| / (||∂g/∂last|| + 1e-4)`` clipped to ``1e4``, where
  ``last`` is the decoder's final conv weight
  (``vqperceptual.py:62-81``, ``get_last_layer``).
* ``disc_factor`` gates on ``global_step >= disc_start``
  (``adopt_weight``, ``vqperceptual.py:13-16``).

TPU-native shape: everything here is a pure function over a param pytree, so
the whole GAN branch jits into the one RCC train-step program; the adaptive
weight takes two extra decoder backwards wrt ONLY the last conv kernel
(a functional substitution, cheaper than materializing full grad trees).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# PatchGAN discriminator (taming layout: BatchNorm, eval-mode running stats)
# ---------------------------------------------------------------------------


def _conv(p, x, stride):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(stride, stride),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        y = y + p["bias"]
    return y


def _bn_eval(p, x, eps=1e-5):
    """BatchNorm2d in eval mode — the discriminator is frozen, so the
    running statistics are an affine transform (torch ``track_running_stats``)."""
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["scale"] + p["bias"]


def discriminator_forward(params: List[dict], x: jnp.ndarray) -> jnp.ndarray:
    """``[B, H, W, C]`` image in ``[-1, 1]`` -> ``[B, h, w, 1]`` patch logits.

    Layout mirrors ``NLayerDiscriminator`` with ``use_actnorm=False``:
    conv(s2)+lrelu, then (n_layers-1) x [conv(s2, no-bias)+BN+lrelu], one
    conv(s1, no-bias)+BN+lrelu, and a final 1-channel conv(s1)."""
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)  # noqa: E731
    h = lrelu(_conv(params[0], x, stride=2))
    middle = params[1:-1]
    for i, layer in enumerate(middle):
        stride = 2 if i < len(middle) - 1 else 1
        h = lrelu(_bn_eval(layer["bn"], _conv(layer, h, stride=stride)))
    return _conv(params[-1], h, stride=1)


def init_taming_discriminator(rng, input_nc: int = 3, ndf: int = 64,
                              n_layers: int = 3) -> List[dict]:
    """Fresh discriminator with the reference's ``weights_init`` scheme
    (convs ~ N(0, 0.02); BN scale ~ N(1, 0.02), bias 0, identity stats)."""
    keys = jax.random.split(rng, 2 * n_layers + 2)
    ki = iter(range(len(keys)))

    def conv(cin, cout, bias):
        k = jax.random.normal(keys[next(ki)], (4, 4, cin, cout)) * 0.02
        p = {"kernel": k}
        if bias:
            p["bias"] = jnp.zeros((cout,))
        return p

    def bn(c):
        return {"scale": jax.random.normal(keys[next(ki)], (c,)) * 0.02 + 1.0,
                "bias": jnp.zeros((c,)), "mean": jnp.zeros((c,)),
                "var": jnp.ones((c,))}

    params = [conv(input_nc, ndf, bias=True)]
    nf_prev = 1
    for n in range(1, n_layers + 1):
        nf = min(2 ** n, 8)
        p = conv(ndf * nf_prev, ndf * nf, bias=False)
        p["bn"] = bn(ndf * nf)
        params.append(p)
        nf_prev = nf
    params.append(conv(ndf * nf_prev, 1, bias=True))
    return params


def convert_taming_discriminator(sd, prefix: str = "loss.discriminator.main.") -> List[dict]:
    """Torch ``NLayerDiscriminator.main`` Sequential -> param list.

    Scans the Sequential indices in order: 4-D weights are convs, entries
    with a ``running_mean`` sibling are BatchNorms attached to the previous
    conv — robust to ``n_layers`` without hardcoding indices."""
    idxs = sorted({int(k[len(prefix):].split(".")[0])
                   for k in sd if k.startswith(prefix)})
    params: List[dict] = []
    for i in idxs:
        base = f"{prefix}{i}"
        w = np.asarray(sd[f"{base}.weight"])
        if w.ndim == 4:  # conv OIHW -> HWIO
            p = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
            if f"{base}.bias" in sd:
                p["bias"] = np.asarray(sd[f"{base}.bias"])
            params.append(p)
        elif f"{base}.running_mean" in sd:  # BatchNorm for the previous conv
            params[-1]["bn"] = {
                "scale": np.asarray(sd[f"{base}.weight"]),
                "bias": np.asarray(sd[f"{base}.bias"]),
                "mean": np.asarray(sd[f"{base}.running_mean"]),
                "var": np.asarray(sd[f"{base}.running_var"]),
            }
    return params


# ---------------------------------------------------------------------------
# Loss pieces (vqperceptual.py:13-30)
# ---------------------------------------------------------------------------


def adopt_weight(weight, global_step, threshold: int = 0, value: float = 0.0):
    """``disc_factor`` gate: 0 before ``threshold`` steps (jit-safe)."""
    return jnp.where(jnp.asarray(global_step) < threshold,
                     jnp.asarray(value, jnp.float32),
                     jnp.asarray(weight, jnp.float32))


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.relu(1.0 - logits_real))
                  + jnp.mean(jax.nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def adaptive_weight(nll_grad_last: jnp.ndarray, g_grad_last: jnp.ndarray,
                    disc_weight: float = 1.0) -> jnp.ndarray:
    """``calculate_adaptive_weight`` (vqperceptual.py:62-81): grad-norm
    ratio on the decoder's last conv kernel, clipped and detached."""
    d = jnp.linalg.norm(nll_grad_last.ravel()) / (
        jnp.linalg.norm(g_grad_last.ravel()) + 1e-4)
    return jax.lax.stop_gradient(jnp.clip(d, 0.0, 1e4)) * disc_weight


@dataclasses.dataclass(frozen=True)
class GanConfig:
    """Generator-side GAN branch config (the RCC trainer's view).

    ``disc_params`` is the frozen discriminator pytree (checkpoint-converted
    via :func:`convert_taming_discriminator`, or fresh). Matches the
    reference semantics: enabling GAN without the checkpoint's trained
    discriminator is possible but as meaningless as it would be in torch."""

    disc_params: tuple  # tuple for hashability under jit closure
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    disc_start: int = 0

    @staticmethod
    def create(disc_params, **kw) -> "GanConfig":
        return GanConfig(disc_params=tuple(disc_params), **kw)


def replace_last_kernel(decoder_params: dict, kernel: jnp.ndarray) -> dict:
    """Functionally substitute the decoder's final ``conv_out`` kernel —
    both taming and MaskGit decoders end in ``nn.Conv(..., name="conv_out")``,
    so grads wrt ONLY the last layer cost one focused backward."""
    out = dict(decoder_params)
    out["conv_out"] = dict(out["conv_out"], kernel=kernel)
    return out


def last_kernel(decoder_params: dict) -> jnp.ndarray:
    return decoder_params["conv_out"]["kernel"]
