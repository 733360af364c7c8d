"""The decode engine: one `lax.scan` loop for every model family.

The reference maintains three hand-written Python decode loops with a
host-side watermark callback spliced into each
(``mingpt.py:326-368``, ``rar.py:407-459``, ``chameleon.py:392-445``). Here a
single scan drives any model that provides a ``step_fn``; the watermark bias,
top-k/top-p warps, and the categorical draw are fused into the scan body so
the entire generation of a batch of images is ONE XLA program — no host
round-trips, no CUDA-graph-style capture needed (the scan body *is* the
captured graph).

Model adapters own their conditioning/CFG logic; the engine owns sampling,
the past-token buffer (watermark context), and the RNG discipline
(`fold_in` per step — reproducible regardless of batch or chunking).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from wmar_tpu.core.sampling import apply_watermark_bias, context_keys_at_step, warp_and_sample
from wmar_tpu.core.spec import WatermarkSpec


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static sampling hyperparameters (compiled into the program)."""

    temperature: float = 1.0
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    greedy: bool = False


@dataclasses.dataclass(frozen=True)
class WatermarkRuntime:
    """A greenlist source bound to a spec, ready to fuse into the sampler."""

    spec: WatermarkSpec
    greenlist: Any

    def bias(self, logits, buffer, length, image_pos):
        keys, valid = context_keys_at_step(self.spec, buffer, length, image_pos)
        return apply_watermark_bias(self.spec, self.greenlist, logits, keys, valid)


# step_fn: (cache, tokens [B], step_index) -> (logits [B, V], cache)
StepFn = Callable[[Any, jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, Any]]


def make_sampler_fn(
    sampler: SamplerConfig,
    watermark: Optional[WatermarkRuntime],
    rng: jax.Array,
    cond_len: int,
):
    """The fused bias+warp+draw applied at every step (shared by the
    single-program scan and the per-phase programs)."""

    def sample_one(logits, buffer, step):
        logits = logits.astype(jnp.float32)
        if watermark is not None:
            logits = watermark.bias(logits, buffer, jnp.int32(cond_len) + step, step)
        return warp_and_sample(
            jax.random.fold_in(rng, step),
            logits,
            temperature=sampler.temperature,
            top_k=sampler.top_k,
            top_p=sampler.top_p,
            greedy=sampler.greedy,
        )

    return sample_one


def make_decode_body(step_fn: StepFn, sample_one, cond_len: int):
    """One scan-step: forward, sample, record into the context buffer."""

    def body(carry, step):
        cache, buffer, prev = carry
        logits, cache = step_fn(cache, prev, step)
        token = sample_one(logits, buffer, step)
        buffer = jax.lax.dynamic_update_slice(
            buffer, token[:, None], (jnp.int32(0), jnp.int32(cond_len) + step)
        )
        return (cache, buffer, token), token

    return body


def decode_tokens(
    step_fn: StepFn,
    cache: Any,
    init_logits: jnp.ndarray,
    num_steps: int,
    rng: jax.Array,
    sampler: SamplerConfig,
    watermark: Optional[WatermarkRuntime] = None,
    cond_tokens: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Any]:
    """Sample ``num_steps`` tokens autoregressively.

    Args:
      step_fn: model adapter. Receives the freshly sampled token batch and the
        image-token step index of the *next* logits it must produce.
      cache: model state after prefill (KV cache etc.).
      init_logits: ``[B, V]`` logits for the first image token (from prefill).
      num_steps: number of tokens to generate (static).
      rng: base PRNG key; per-step keys are ``fold_in(rng, step)``.
      sampler: static sampling config.
      watermark: optional fused watermark.
      cond_tokens: ``[B, c]`` conditioning tokens prepended to the watermark
        context buffer — the reference's Taming path hands the processor
        ``past_ids`` *including* conditioning (``mingpt.py:349``), so the
        first image token is watermarked with the class token as context.
        Pass ``None`` for RAR-style models (context starts empty).

    Returns:
      ``(tokens [B, num_steps], final_cache)``.

    Growing-window "phased" decode was removed after measurement: separate
    cache windows lost to the single full-window scan on-chip (23 -> 17
    imgs/s RAR), and the chunked packed kernel (``WMAR_PACKED_CHUNK``,
    ``ops/flash_decode.py``) covers the long-context case inside ONE
    program (PERFORMANCE.md).
    """
    b = init_logits.shape[0]
    c = 0 if cond_tokens is None else cond_tokens.shape[1]
    buffer = jnp.zeros((b, c + num_steps), dtype=jnp.int32)
    if cond_tokens is not None:
        buffer = buffer.at[:, :c].set(cond_tokens.astype(jnp.int32))

    sample_one = make_sampler_fn(sampler, watermark, rng, c)
    token0 = sample_one(init_logits, buffer, jnp.int32(0))
    buffer = buffer.at[:, c].set(token0)

    if num_steps == 1:
        return token0[:, None], cache

    body = make_decode_body(step_fn, sample_one, c)
    (cache, buffer, _), rest = jax.lax.scan(
        body, (cache, buffer, token0), jnp.arange(1, num_steps, dtype=jnp.int32)
    )
    tokens = jnp.concatenate([token0[None], rest], axis=0).T  # [B, S]
    return tokens, cache
