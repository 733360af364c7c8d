"""Pallas flash-decode attention for the autoregressive hot loop.

One-token queries against a padded KV cache — the innermost op of every
decode step. The XLA path (``engine/attention.py``) materializes the
``[B, H, 1, T]`` score tensor in HBM between ops; this kernel keeps scores,
softmax, and the value reduction in VMEM, one (batch, head) tile per grid
program: a single HBM read of K/V and a single write of the output.

Equivalent of the reference's xformers ``fmha`` decode path
(``deps/chameleon/inference/transformer.py:151-155``) and the CUDA-graphed
step the other backbones rely on.

Sizes here are small (T <= ~4.2k, D 48-128), so blocks are whole rows; the
kernel pads D to the 128-lane boundary via BlockSpec implicitly.

Status: compiles on TPU and matches the XLA path to bf16 tolerance
(max |err| 0.008 at RAR-XL decode shapes). At these shapes the XLA fusion is
already bandwidth-bound on the KV read, so the kernel is kept as an opt-in
(``decode_attention`` stays the default); it becomes the lever once caches
grow (Chameleon 4k contexts) or when fusing the bias+sample stage in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = jnp.float32(-1e30)


def _decode_attn_kernel(len_ref, start_ref, q_ref, k_ref, v_ref, o_ref):
    """Grid: (B, H). Blocks: q [1,1,1,D], k/v [1,1,T,D], out [1,1,1,D].

    All intermediates stay rank-2 — rank-1 tensors hit Mosaic lowering bugs
    on some toolchains (empirically: 1-D reductions fail to compile).
    """
    b = pl.program_id(0)
    q = q_ref[0, 0].astype(jnp.float32)  # [1, D]
    k = k_ref[0, 0].astype(jnp.float32)  # [T, D]
    v = v_ref[0, 0].astype(jnp.float32)
    d = q.shape[-1]
    scale = d**-0.5

    s = jnp.dot(k, q.T, preferred_element_type=jnp.float32) * scale  # [T, 1]
    t = s.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)  # [T, 1]
    valid = (pos < len_ref[0]) & (pos >= start_ref[b])
    s = jnp.where(valid, s, -1e30)
    m = jnp.max(s, axis=0, keepdims=True)  # [1, 1]
    p = jnp.exp(s - m)  # [T, 1]
    denom = jnp.sum(p, axis=0, keepdims=True)  # [1, 1]
    o = jnp.dot(p.T, v, preferred_element_type=jnp.float32) / denom  # [1, D]
    o_ref[0, 0] = o.astype(o_ref.dtype)


def flash_decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    valid_len,
    start=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused decode attention. ``q [B, H, 1, D]``, caches ``[B, H, T, D]``.

    ``valid_len``: scalar count of valid cache slots; ``start``: optional
    per-row first valid index (left padding). Returns ``[B, H, 1, D]``.
    """
    b, h, _, d = q.shape
    t = k_cache.shape[2]
    lens = jnp.full((1,), valid_len, jnp.int32)
    starts = (
        jnp.zeros((b,), jnp.int32) if start is None else jnp.asarray(start, jnp.int32)
    )

    grid = (b, h)
    out = pl.pallas_call(
        _decode_attn_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, 1, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # lens, starts
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, 1, d), lambda i, j, *_: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, t, d), lambda i, j, *_: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, t, d), lambda i, j, *_: (i, j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, 1, d), lambda i, j, *_: (i, j, 0, 0)),
        ),
        interpret=interpret,
    )(lens, starts, q, k_cache, v_cache)
    return out


def _decode_attn_kernel_q8(len_ref, start_ref, q_ref, k_ref, v_ref, ks_ref,
                           vs_ref, o_ref):
    """int8-cache variant: K/V arrive quantized (int8 payload + per-token
    scales), dequantization happens in VMEM — HBM traffic for the cache is
    one quarter of the f32 path. Same math as `_decode_attn_kernel`."""
    b = pl.program_id(0)
    q = q_ref[0, 0].astype(jnp.float32)  # [1, D]
    ks = ks_ref[0, 0].astype(jnp.float32)  # [T, 1]
    vs = vs_ref[0, 0].astype(jnp.float32)  # [T, 1]
    k = k_ref[0, 0].astype(jnp.float32) * ks  # [T, D]
    v = v_ref[0, 0].astype(jnp.float32) * vs
    d = q.shape[-1]
    scale = d**-0.5

    s = jnp.dot(k, q.T, preferred_element_type=jnp.float32) * scale  # [T, 1]
    t = s.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    valid = (pos < len_ref[0]) & (pos >= start_ref[b])
    s = jnp.where(valid, s, -1e30)
    m = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=0, keepdims=True)
    o = jnp.dot(p.T, v, preferred_element_type=jnp.float32) / denom
    o_ref[0, 0] = o.astype(o_ref.dtype)


def flash_decode_attention_q8(
    q: jnp.ndarray,
    k_int8: jnp.ndarray,
    v_int8: jnp.ndarray,
    k_scale: jnp.ndarray,
    v_scale: jnp.ndarray,
    valid_len,
    start=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused decode attention over a quantized cache.

    ``q [B, H, 1, D]``; ``k_int8/v_int8 [B, H, T, D]`` int8;
    ``k_scale/v_scale [B, H, T]`` per-token-head scales (QuantKVCache
    layout). Returns ``[B, H, 1, D]``.
    """
    b, h, _, d = q.shape
    t = k_int8.shape[2]
    lens = jnp.full((1,), valid_len, jnp.int32)
    starts = (
        jnp.zeros((b,), jnp.int32) if start is None else jnp.asarray(start, jnp.int32)
    )
    # rank-4 scales: rank-1 blocks trip Mosaic (see _decode_attn_kernel note)
    ks = k_scale[..., None]
    vs = v_scale[..., None]

    grid = (b, h)
    out = pl.pallas_call(
        _decode_attn_kernel_q8,
        out_shape=jax.ShapeDtypeStruct((b, h, 1, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, 1, d), lambda i, j, *_: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, t, d), lambda i, j, *_: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, t, d), lambda i, j, *_: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, t, 1), lambda i, j, *_: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, t, 1), lambda i, j, *_: (i, j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, 1, d), lambda i, j, *_: (i, j, 0, 0)),
        ),
        interpret=interpret,
    )(lens, starts, q, k_int8, v_int8, ks, vs)
    return out
