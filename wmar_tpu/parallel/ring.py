"""Ring-attention sequence-parallel prefill over an ``sp`` mesh axis.

The reference prefills the full prompt on every GPU worker and re-prefills
the whole history at each modality switch
(``deps/chameleon/inference/generation.py``); the prompt's sequence axis is
never sharded. On TPU the sequence is a shardable dimension like any other:
place T on an ``sp`` mesh axis, keep each chip's query block resident, and
rotate the K/V blocks around the ring with ``ppermute`` while accumulating a
numerically-stable online softmax (Liu et al., "Ring Attention with
Blockwise Transformers" — the TPU-native form of sequence parallelism).
Per-chip attention compute and activation memory drop by sp×, and XLA
overlaps each hop's ``ppermute`` with the next block's matmuls because the
loop is unrolled (sp is a static mesh size).

Composes with the megatron tensor-parallel specs (heads on ``tp``) and
batch data parallelism (``dp``): the kernel is per-head and per-row, so
those axes are simply localized by ``shard_map`` without collectives.

Masking matches :func:`wmar_tpu.engine.attention.decode_attention`'s
multi-token burst semantics at ``write_pos=0``: causal on absolute key
index, optional per-row ``start`` (left-pad of right-aligned ragged
prompts) and per-row/per-position ``key_mask`` (Chameleon CFG rows sharing
one token history).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = float(-1e30)  # plain float: a module-level jnp array would init the XLA backend at import, breaking later jax.distributed.initialize


def _ring_body(q, k, v, km, start, *, axis_name: str, n: int, scale: float):
    """shard_map body: local ``q,k,v [B, Hl, Tl, D]``, ``km [B, Tl]`` key
    validity aligned with this chip's key block, ``start [B]`` first valid
    global key index per row. Rotates (k, v, km, kidx) around the ring."""
    b, h, tl, d = q.shape
    me = jax.lax.axis_index(axis_name)
    qidx = me * tl + jnp.arange(tl, dtype=jnp.int32)  # global query indices
    kidx = qidx  # this chip's initial key block is its own

    o = jnp.zeros((b, h, tl, d), jnp.float32)
    m = jnp.full((b, h, tl), NEG_INF)
    l = jnp.zeros((b, h, tl), jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]

    for _ in range(n):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
        ok = (kidx[None, None, :] <= qidx[None, :, None])  # [1, Tq, Tk] causal
        ok = ok & (kidx[None, None, :] >= start[:, None, None])
        ok = ok & km[:, None, :]
        okb = ok[:, None]  # [B, 1, Tq, Tk]
        s = jnp.where(okb, s, NEG_INF)
        m_new = jnp.maximum(m, s.max(-1))
        # multiply by the mask so a fully-masked row stays l=0 / o=0 instead
        # of exp(NEG_INF - NEG_INF) = 1 polluting the accumulators
        p = jnp.exp(s - m_new[..., None]) * okb
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(-1)
        o = o * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v.dtype), v
        ).astype(jnp.float32)
        m = m_new
        if n > 1:
            k = jax.lax.ppermute(k, axis_name, perm)
            v = jax.lax.ppermute(v, axis_name, perm)
            km = jax.lax.ppermute(km, axis_name, perm)
            kidx = jax.lax.ppermute(kidx, axis_name, perm)

    return (o / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


def ring_prefill_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    sp_axis: str = "sp",
    tp_axis: Optional[str] = None,
    dp_axis: Optional[str] = None,
    start: Optional[jnp.ndarray] = None,
    key_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Causal prefill attention with the sequence axis sharded over ``sp``.

    Args:
      q, k, v: ``[B, H, T, D]``; T must be divisible by ``mesh.shape[sp_axis]``.
      tp_axis / dp_axis: optional mesh axes the heads / batch dims live on —
        named so shard_map localizes them (the kernel itself is per-head and
        per-row; no collectives cross these axes).
      start: optional ``[B]`` first valid key index per row.
      key_mask: optional ``[B, T]`` per-position key validity.

    Returns ``[B, H, T, D]`` attention outputs, sequence-sharded like ``q``.
    """
    b, h, t, d = q.shape
    n = mesh.shape[sp_axis]
    if t % n != 0:
        raise ValueError(f"seq len {t} not divisible by sp={n}")
    scale = scale if scale is not None else d**-0.5
    start = start if start is not None else jnp.zeros((b,), jnp.int32)
    key_mask = key_mask if key_mask is not None else jnp.ones((b, t), bool)

    qkv_spec = P(dp_axis, tp_axis, sp_axis, None)
    import functools

    body = functools.partial(_ring_body, axis_name=sp_axis, n=n, scale=scale)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, P(dp_axis, sp_axis), P(dp_axis)),
        out_specs=qkv_spec,
        check_vma=False,
    )(q, k, v, key_mask, start)
