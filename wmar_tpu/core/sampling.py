"""Sampler primitives: watermark logit bias, top-k/top-p warps, CFG.

These are the pure functions the decode engine fuses into its `lax.scan`
body. The reference applies, in order: watermark logit processor ->
temperature -> top-k -> top-p -> multinomial
(``deps/taming/modules/transformer/mingpt.py:326-368``); warp semantics match
HuggingFace's ``TopKLogitsWarper``/``TopPLogitsWarper`` so token trajectories
agree given equal randomness (and exactly, under greedy decoding).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from wmar_tpu.core.spec import SeedStrategy, WatermarkSpec

NEG_INF = float(-1e10)  # plain float: a module-level jnp array would init the XLA backend at import, breaking later jax.distributed.initialize


# ---------------------------------------------------------------------------
# Watermark bias (sampler side)
# ---------------------------------------------------------------------------


def context_keys_at_step(
    spec: WatermarkSpec,
    buffer: jnp.ndarray,
    length: jnp.ndarray,
    image_pos: jnp.ndarray,
):
    """Greenlist key + validity for the token about to be sampled.

    Args:
      spec: watermark spec.
      buffer: int32 ``[B, L]`` past-token buffer. For Taming-style models it
        begins with the conditioning token(s) (the reference passes the whole
        ``past_ids`` including conditioning to the processor); for RAR it
        holds generated tokens only.
      length: scalar int — number of valid tokens currently in ``buffer``.
      image_pos: scalar int — index of the image token being generated
        (drives spatial seeding; equals ``length`` minus conditioning length).

    Returns:
      ``(keys [B], valid scalar bool)`` — key is the context sum.
    """
    h = spec.context_size
    if spec.seed_strategy == SeedStrategy.FIXED:
        return jnp.zeros((buffer.shape[0],), jnp.int32), jnp.bool_(True)

    if spec.seed_strategy == SeedStrategy.LINEAR:
        valid = length >= h
        start = jnp.maximum(length - h, 0)
        idx = start + jnp.arange(h)
        ctx = buffer[:, idx]  # [B, h] gather at traced offsets
        return ctx.sum(axis=1, dtype=jnp.int32), valid

    # SPATIAL
    dim = spec.spatial_dim
    if h == 1:
        valid = image_pos >= 1
        at_row_start = (image_pos % dim) == 0
        off = jnp.where(at_row_start, dim, 1)
        idx = jnp.maximum(length - off, 0)
        return buffer[:, idx].astype(jnp.int32), valid
    if h == 3:
        valid = image_pos >= dim + 1
        idxs = jnp.maximum(length - jnp.array([dim + 1, dim, 1]), 0)
        ctx = buffer[:, idxs]  # [B, 3]
        return ctx.sum(axis=1, dtype=jnp.int32), valid
    raise ValueError("spatial seeding supports h in {1, 3}")


def apply_watermark_bias(
    spec: WatermarkSpec,
    greenlist,
    logits: jnp.ndarray,
    keys: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """``logits[b, t] += delta`` where token t is green for ``keys[b]``.

    ``valid`` gates the whole step (the reference skips the watermark while
    the context window is underfull). Only the first ``spec.vocab_size``
    logits are eligible (equals the full width for Taming/RAR; Chameleon
    passes its image-token slice).
    """
    mask = greenlist.green_mask(keys).astype(logits.dtype)  # [B, V]
    v = spec.vocab_size
    if logits.shape[-1] != v:
        raise ValueError(f"logits width {logits.shape[-1]} != vocab {v}")
    return logits + jnp.where(valid, spec.delta, 0.0) * mask


# ---------------------------------------------------------------------------
# Warping + sampling
# ---------------------------------------------------------------------------


def warp_and_sample(
    rng: jax.Array,
    logits: jnp.ndarray,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    greedy: bool = False,
) -> jnp.ndarray:
    """Temperature -> top-k -> top-p -> categorical draw. ``[B, V] -> [B]``.

    ``top_k``/``top_p`` are static (they shape the compiled program).
    Sampling runs in the truncated top-k space, so the per-step cost is a
    single ``lax.top_k`` plus O(k) work instead of a full-vocab sort.
    """
    v = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    if temperature != 1.0:
        logits = logits / jnp.float32(temperature)

    k = min(top_k, v) if top_k else v
    if greedy and (top_p is None or top_p >= 1.0):
        return jnp.argmax(logits, axis=-1)

    vals, idx = jax.lax.top_k(logits, k)  # descending
    if top_p is not None and top_p < 1.0:
        probs = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # HF semantics: remove tokens once the cumulative mass *before* them
        # exceeds top_p; the crossing token is kept.
        keep = (cum - probs) <= top_p
        vals = jnp.where(keep, vals, NEG_INF)

    if greedy:
        choice = jnp.argmax(vals, axis=-1)
    else:
        choice = jax.random.categorical(rng, vals, axis=-1)
    return jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]


# ---------------------------------------------------------------------------
# Classifier-free guidance
# ---------------------------------------------------------------------------


def cfg_combine(cond_logits: jnp.ndarray, uncond_logits: jnp.ndarray, scale) -> jnp.ndarray:
    """Standard 2-branch CFG: ``uncond + (cond - uncond) * scale``."""
    return uncond_logits + (cond_logits - uncond_logits) * scale


def rar_cfg_scale(step: jnp.ndarray, seq_len: int, guidance_scale: float, guidance_scale_pow: float):
    """RAR's cosine-annealed guidance schedule (``deps/rar/modeling/rar.py:429-436``):
    ``1 + (g - 1) * (1 - cos(pi * (step/seq_len)^pow)) / 2``."""
    frac = (step.astype(jnp.float32) / seq_len) ** jnp.float32(guidance_scale_pow)
    scale_step = (1.0 - jnp.cos(frac * jnp.pi)) * 0.5
    return (guidance_scale - 1.0) * scale_step + 1.0


def instruct_cfg_combine(
    full_logits: jnp.ndarray,
    image_cond_logits: jnp.ndarray,
    uncond_logits: jnp.ndarray,
    guidance_text: float,
    guidance_image: float,
) -> jnp.ndarray:
    """Chameleon's 3-branch instruct CFG
    (``deps/chameleon/inference/logits_processor.py:312-336``)."""
    return (
        uncond_logits
        + guidance_image * (image_cond_logits - uncond_logits)
        + guidance_text * (full_logits - image_cond_logits)
    )
