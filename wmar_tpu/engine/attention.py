"""Attention for prefill and single-token decode.

Decode attends a 1-token query against the padded KV cache with a length
mask — the XLA form of flash-decode. Sequences here are short (<= ~4.2k for
Chameleon, 256-1024 for the image models), so a padded masked softmax is
already bandwidth-optimal; a fused Pallas kernel for the decode step lives in
``wmar_tpu.engine.pallas_kernels`` and is used on TPU for the hot loop.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float(-1e30)  # plain float: a module-level jnp array would init the XLA backend at import, breaking later jax.distributed.initialize


def cached_decode_attention(q, cache, layer: int, valid_len, start=None, key_mask=None):
    """Decode attention against ``cache``, dispatching on the cache type.

    ``PackedQuantKVCache`` single-token steps route to the batch-blocked
    Pallas kernel (interpret mode off-TPU so tests cover the same code
    path); everything else — float/int8/int4 caches, prefill bursts, ragged
    ``start``/``key_mask`` rows — goes through the XLA path, whose
    elementwise dequantization fuses into the attention dots.
    """
    from wmar_tpu.engine.kvcache import Packed4QuantKVCache, PackedQuantKVCache

    interpret = jax.default_backend() != "tpu"
    # start/key_mask are only supported by the CHUNKED kernel paths (q8 and
    # packed4), which the wrappers activate at long contexts (T >= 1024)
    masked = start is not None or key_mask is not None
    masks_ok = (not masked) or (
        isinstance(cache, (PackedQuantKVCache, Packed4QuantKVCache))
        and cache.max_len >= 1024
    )
    if (
        isinstance(cache, (PackedQuantKVCache, Packed4QuantKVCache))
        and q.shape[2] == 1
        and q.shape[1] == cache.n_heads  # no GQA head-repeat inside the kernel
        and masks_ok
    ):
        mesh = cache.mesh
        if mesh is not None and (cache.dp_axis or cache.tp_axis):
            # sharded serving: shard_map localizes the kernel per chip (a
            # bare pallas_call would all-gather the sharded cache instead)
            from wmar_tpu.ops.flash_decode import sharded_packed_decode_attention

            return sharded_packed_decode_attention(
                q, cache, layer, valid_len, start=start, key_mask=key_mask,
                interpret=interpret)
        # single-chip path. The grouped (tp_groups > 1) layout is only a
        # valid kernel input per-shard, and a dp-sharded cache with no mesh
        # context would be replicated (all-gathered) at the un-partitioned
        # pallas_call — both fall through to the XLA path below. Interpret
        # mode (tests) lowers to plain jax ops, which shard fine.
        if cache.tp_groups == 1 and (interpret or jax.device_count() == 1):
            from wmar_tpu.ops.flash_decode import (
                packed4_decode_attention,
                packed_decode_attention_q8,
            )

            if isinstance(cache, Packed4QuantKVCache):
                return packed4_decode_attention(
                    q, cache.kv, cache.scale, layer, valid_len,
                    start=start, key_mask=key_mask, interpret=interpret)
            return packed_decode_attention_q8(
                q, cache.kv, cache.scale, layer, valid_len,
                start=start, key_mask=key_mask, interpret=interpret)
    k_all, v_all = cache.layer(layer)
    return decode_attention(q, k_all, v_all, valid_len, start=start, key_mask=key_mask)


def prefill_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = True,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Full self-attention over the prompt. ``q, k, v: [B, H, T, D]``."""
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if causal:
        t = q.shape[2]
        mask = jnp.tril(jnp.ones((t, t), dtype=bool))
        s = jnp.where(mask, s, NEG_INF)
    p = jnp.exp(s - s.max(axis=-1, keepdims=True))
    p = p / p.sum(axis=-1, keepdims=True)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    valid_len,
    scale: Optional[float] = None,
    start=None,
    key_mask=None,
) -> jnp.ndarray:
    """One-token decode attention against a padded cache.

    Args:
      q: ``[B, H, t, D]`` current queries (t is 1, or 2 for RAR's first step).
      k_cache, v_cache: ``[B, H, T_max, D]`` padded caches.
      valid_len: scalar — number of valid cache positions (including the
        freshly written current token(s)).
      start: optional per-row ``[B]`` first valid cache index — masks out
        left padding of right-aligned ragged prompts (the reference's
        AlignPromptRight + BlockDiagonal attention bias).

    Returns:
      ``[B, H, t, D]`` attention outputs.
    """
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k_cache).astype(jnp.float32) * scale
    t_max = k_cache.shape[2]
    ar = jnp.arange(t_max)
    if q.shape[2] > 1:
        # Multi-token decode burst (prefill through the cache): causal
        # within the burst. Query i sits at absolute position
        # valid_len - t + i, keys are valid up to and including it.
        t = q.shape[2]
        qpos = valid_len - t + jnp.arange(t)  # [t]
        pos_ok = ar[None, :] <= qpos[:, None]  # [t, T_max]
        pos_ok = jnp.broadcast_to(pos_ok[None], (q.shape[0], t, t_max))
    else:
        pos_ok = jnp.broadcast_to((ar < valid_len)[None, None], (q.shape[0], 1, t_max))
    if start is not None:
        pos_ok = pos_ok & (ar[None, None, :] >= start[:, None, None])
    if key_mask is not None:
        # per-row per-position validity [B, T_max] — lets rows of one cache
        # attend to different token subsets (Chameleon CFG rows share one
        # token history instead of re-prefilling per modality segment)
        pos_ok = pos_ok & key_mask[:, None, :]
    s = jnp.where(pos_ok[:, None], s, NEG_INF)
    p = jnp.exp(s - s.max(axis=-1, keepdims=True))
    p = p / p.sum(axis=-1, keepdims=True)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v_cache.dtype), v_cache)
