"""GPipe-style pipeline-parallel Llama prefill over a ``pp`` mesh axis.

The reference never pipelines: its Chameleon runs every layer on every GPU
worker (tensor-parallel only, ``deps/chameleon/inference/transformer.py``).
On TPU the layer axis is a shardable dimension like the others: stack the
block params with a leading ``[L]`` axis, place it on a ``pp`` mesh axis so
each chip holds ``L/pp`` contiguous layers, and stream microbatches through
the stage ring with ``ppermute`` — the classic GPipe schedule, expressed as
one ``lax.scan`` over ``M + pp - 1`` ticks inside ``shard_map``. Per-chip
weight memory drops by pp× (the axis that matters for models that do not fit
a single chip even at int8), and with ``M >= pp`` microbatches the bubble
fraction is ``(pp-1)/(M+pp-1)``.

The stage body reuses :func:`wmar_tpu.models.llama.block_attn_inputs` /
``block_finish`` — the same math as ``llama_forward``, so the paths cannot
diverge — with dense causal prefill attention per microbatch
(``engine.attention.decode_attention`` multi-token-burst semantics,
including per-row ``start`` and ``key_mask``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from wmar_tpu.engine.attention import decode_attention
from wmar_tpu.engine.kvcache import KVCache
from wmar_tpu.models.llama import LlamaConfig, block_attn_inputs, block_finish, _rms
from wmar_tpu.ops import wquant


def stack_blocks(blocks):
    """Stack the per-layer param dicts into one pytree with a leading
    ``[L]`` axis (the axis ``llama_prefill_pp`` shards over ``pp``)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def _pp_body(blocks_l, xm, pos_m, start_m, km_m, *, cfg, axis_name, n_stages,
             n_micro):
    """shard_map body. ``blocks_l``: this stage's ``[L/pp, ...]`` layers;
    ``xm [M, mb, t, d]`` embedded microbatches (replicated); metadata
    likewise. Returns (final hidden [M, mb, t, d], k/v [L/pp, M, mb, H, t, D])."""
    s = jax.lax.axis_index(axis_name)
    m, mb, t, d = xm.shape
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def layer_step(x, blk_meta):
        blk, pos, st, km = blk_meta
        q, k, v = block_attn_inputs(blk, cfg, x, pos)
        attn = decode_attention(q, k, v, jnp.int32(t), start=st, key_mask=km)
        return block_finish(blk, cfg, x, attn), (k, v)

    def tick(carry, tk):
        buf, outs, kk, vv = carry
        idx = tk - s  # which microbatch this stage works on at this tick
        valid = (idx >= 0) & (idx < n_micro)
        idxc = jnp.clip(idx, 0, n_micro - 1)
        x_in = jnp.where(s == 0, xm[idxc], buf)
        pos, st, km = pos_m[idxc], start_m[idxc], km_m[idxc]
        y, (ks, vs) = jax.lax.scan(
            lambda x, blk: layer_step(x, (blk, pos, st, km)), x_in, blocks_l
        )
        kk = kk.at[:, idxc].set(jnp.where(valid, ks, kk[:, idxc]))
        vv = vv.at[:, idxc].set(jnp.where(valid, vs, vv[:, idxc]))
        outs = outs.at[idxc].set(
            jnp.where(valid & (s == n_stages - 1), y, outs[idxc])
        )
        buf = jax.lax.ppermute(y, axis_name, perm)
        return (buf, outs, kk, vv), None

    l_local = jax.tree.leaves(blocks_l)[0].shape[0]
    h, hd = cfg.n_heads, cfg.head_dim
    carry0 = (
        jnp.zeros((mb, t, d), xm.dtype),
        jnp.zeros((m, mb, t, d), xm.dtype),
        jnp.zeros((l_local, m, mb, h, t, hd), xm.dtype),
        jnp.zeros((l_local, m, mb, h, t, hd), xm.dtype),
    )
    (_, outs, kk, vv), _ = jax.lax.scan(
        tick, carry0, jnp.arange(n_micro + n_stages - 1, dtype=jnp.int32)
    )
    # only the last stage wrote real outputs (others hold zeros): psum is a
    # broadcast, making the hidden states replicated across stages
    outs = jax.lax.psum(outs, axis_name)
    return outs, kk, vv


def llama_prefill_pp(
    params,
    cfg: LlamaConfig,
    tokens: jnp.ndarray,
    cache: KVCache,
    positions: jnp.ndarray,
    mesh: Mesh,
    *,
    pp_axis: str = "pp",
    microbatches: Optional[int] = None,
    start: Optional[jnp.ndarray] = None,
    key_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Pipeline-parallel prefill at ``write_pos=0``: layers sharded over
    ``pp``, microbatches streamed through the stage ring.

    Args:
      tokens, positions: ``[B, t]``; ``B`` must divide by ``microbatches``
        (default: the pp stage count).
      start: optional ``[B]`` first valid key index (left-pad masking).
      key_mask: optional ``[B, T_max]`` per-position key validity.

    Returns ``(logits [B, t, vocab] fp32, cache)`` matching
    :func:`wmar_tpu.models.llama.llama_forward` on the valid (non-pad)
    positions.
    """
    n_stages = mesh.shape[pp_axis]
    if cfg.n_layers % n_stages != 0:
        raise ValueError(f"{cfg.n_layers} layers not divisible by pp={n_stages}")
    b, t = tokens.shape
    # default: the most microbatches (≤ stage count) that divide the batch —
    # more microbatches = smaller pipeline bubble (pp-1)/(M+pp-1)
    m = microbatches or max(
        d for d in range(1, min(n_stages, b) + 1) if b % d == 0
    )
    if b % m != 0:
        raise ValueError(f"batch {b} not divisible by microbatches={m}")
    mb = b // m

    x = params["tok_embeddings"][tokens]
    d = x.shape[-1]
    xm = x.reshape(m, mb, t, d)
    pos_m = positions.reshape(m, mb, t)
    start_m = (start if start is not None else jnp.zeros((b,), jnp.int32)
               ).reshape(m, mb)
    km = (key_mask[:, :t] if key_mask is not None
          else jnp.ones((b, t), bool)).reshape(m, mb, t)

    stacked = stack_blocks(params["blocks"])
    body = functools.partial(
        _pp_body, cfg=cfg, axis_name=pp_axis, n_stages=n_stages, n_micro=m
    )
    outs, kk, vv = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(pp_axis), P(), P(), P(), P()),
        out_specs=(P(), P(pp_axis), P(pp_axis)),
        check_vma=False,
    )(stacked, xm, pos_m, start_m, km)

    # cache writes: [L, M, mb, H, t, D] -> per-layer [B, H, t, D]
    kk = kk.reshape(cfg.n_layers, b, cfg.n_heads, t, cfg.head_dim)
    vv = vv.reshape(cfg.n_layers, b, cfg.n_heads, t, cfg.head_dim)
    for li in range(cfg.n_layers):
        cache = cache.write(li, 0, kk[li], vv[li])

    y = outs.reshape(b, t, d)
    y = _rms(y, params["norm"], cfg.norm_eps)
    logits = wquant.matmul(y, params["output"]).astype(jnp.float32)
    return logits, cache
