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

Status: all four variants (bf16 / int8-cache, each with/without per-row key
masks) compile on TPU and match the XLA path (max |err| <= 1e-3 at the
Chameleon-4k shape, 0.008 at RAR-XL). Measured (PERFORMANCE.md): at RAR
decode shapes XLA's fusion wins (grid overhead), so ``decode_attention``
stays the engine default; at the Chameleon-4k shape the bf16 kernel is 17%
faster than XLA — the long-context serving lever. Key masks use additive
float bias inside the kernel: bf16 bool compares fail to lower on the
remote Mosaic toolchain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-1e30)  # plain float: a module-level jnp array would init the XLA backend at import, breaking later jax.distributed.initialize


def _attn_body(len_ref, start_ref, q_ref, k_ref, v_ref, o_ref, km_ref=None):
    """Shared body. Grid: (B, H); blocks q [1,1,1,D], k/v [1,1,T,D],
    optional key-mask [1,1,T,1], out [1,1,1,D].

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
    if km_ref is not None:
        # additive float mask (mask 1 -> +0, 0 -> -1e30): bf16 bool compares
        # fail to lower on the remote Mosaic toolchain
        s = s + (km_ref[0, 0].astype(jnp.float32) - 1.0) * jnp.float32(1e30)
    m = jnp.max(s, axis=0, keepdims=True)  # [1, 1]
    p = jnp.exp(s - m)  # [T, 1]
    denom = jnp.sum(p, axis=0, keepdims=True)  # [1, 1]
    o = jnp.dot(p.T, v, preferred_element_type=jnp.float32) / denom  # [1, D]
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _decode_attn_kernel(len_ref, start_ref, q_ref, k_ref, v_ref, o_ref):
    _attn_body(len_ref, start_ref, q_ref, k_ref, v_ref, o_ref)


def _decode_attn_kernel_km(len_ref, start_ref, q_ref, k_ref, v_ref, km_ref, o_ref):
    _attn_body(len_ref, start_ref, q_ref, k_ref, v_ref, o_ref, km_ref)


def flash_decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    valid_len,
    start=None,
    key_mask=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused decode attention. ``q [B, H, 1, D]``, caches ``[B, H, T, D]``.

    ``valid_len``: scalar count of valid cache slots; ``start``: optional
    per-row first valid index (left padding); ``key_mask``: optional
    per-row per-slot validity ``[B, T]`` (the fused-interleaved CFG rows).
    Returns ``[B, H, 1, D]``.
    """
    b, h, _, d = q.shape
    t = k_cache.shape[2]
    lens = jnp.full((1,), valid_len, jnp.int32)
    starts = (
        jnp.zeros((b,), jnp.int32) if start is None else jnp.asarray(start, jnp.int32)
    )
    in_specs = [
        pl.BlockSpec((1, 1, 1, d), lambda i, j, *_: (i, j, 0, 0)),
        pl.BlockSpec((1, 1, t, d), lambda i, j, *_: (i, j, 0, 0)),
        pl.BlockSpec((1, 1, t, d), lambda i, j, *_: (i, j, 0, 0)),
    ]
    args = [lens, starts, q, k_cache, v_cache]
    kernel = _decode_attn_kernel
    if key_mask is not None:
        # same block layout as the proven q8 scale inputs: [B, H, T, 1],
        # indexed (i, j) — size-1 middle dims trip the remote Mosaic build
        km = jnp.broadcast_to(
            jnp.asarray(key_mask, jnp.bfloat16)[:, None, :, None], (b, h, t, 1))
        in_specs.append(pl.BlockSpec((1, 1, t, 1), lambda i, j, *_: (i, j, 0, 0)))
        args.append(km)
        kernel = _decode_attn_kernel_km

    grid = (b, h)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, 1, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # lens, starts
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, 1, d), lambda i, j, *_: (i, j, 0, 0)),
        ),
        interpret=interpret,
    )(*args)
    return out


def _packed_attn_kernel_q8(len_ref, q_ref, kv_ref, s_ref, o_ref):
    """Packed-heads decode attention over an int8 cache laid out ``[T, 2*H*D]``.

    Why this exists: at RAR decode shapes (B=128, H=16, T=258, D=64) the
    per-(batch, head) kernel above runs a grid of 2048 programs whose 33 KB
    blocks leave the DMA engines idle — measured 2.5x *slower* than XLA
    (PERFORMANCE.md). This kernel flips the decomposition: the grid covers
    batch blocks only, each program streams one ``[RB, T, 2*H*D]`` int8 K+V
    tile (a single full-width DMA), and all H heads of one row are computed
    in TWO MXU matmuls instead of 2·H batched matvecs:

      scores[H, T] = Qbd[H, H*D] · K[T, H*D]ᵀ     (block-diagonal query)
      out[H, H*D]  = P[H, T] · V[T, H*D]           (diagonal blocks kept)

    where ``Qbd[h'] = q_h' on its own head's D-slice, 0 elsewhere`` and the
    diagonal extraction is a masked sublane reduction. The H× MXU waste is
    irrelevant — the op is cache-read bandwidth bound and the matmuls hide
    under the DMA stream.

    Two integration rules learned the hard way (the first wiring measured 3x
    *slower* end-to-end than its own microbench):
      * the kernel takes the FULL stacked ``[L, ...]`` cache with the layer
        baked into the BlockSpec index map — slicing ``kv[layer]`` outside
        materializes a per-layer HBM copy at the custom-call boundary;
      * scales live in ``[2H, T]`` orientation (T on lanes). A ``[T, H]``
        array has a 16-wide minor dim that XLA lane-pads 16 -> 128, an 8x
        read blowup per step. ``[2H, T]`` also makes both dots transpose-free
        and the softmax a lane-axis reduction.

    Per-(token, head) scales are applied *after* the score matmul (exact,
    one [H, T] VPU multiply) and folded into P before the value matmul, so
    the int8 payload feeds the MXU directly.

    Blocks: q ``[RB, 1, HD]``, kv ``[1, RB, T, 2*HD]`` int8 (lanes
    ``[:HD]`` = K, ``[HD:]`` = V), scales ``[1, RB, 2H, T]`` (rows ``[:H]``
    = K, ``[H:]`` = V), out ``[RB, 1, HD]``. Grid: ``(B // RB,)``.
    """
    _, rb, t, hd2 = kv_ref.shape
    hd = hd2 // 2
    h = s_ref.shape[2] // 2
    d = hd // h
    scale = jnp.float32(d**-0.5)

    # [H, HD] mask: row h' owns lane block [h'*D, (h'+1)*D) — shared by the
    # block-diagonal query build and the diagonal extraction.
    col = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 0)
    head_mask = (col // d == row).astype(jnp.float32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (h, t), 1)
    valid = pos < len_ref[0]

    for r in range(rb):  # static unroll: RB independent rows per program
        qrow = q_ref[r].astype(jnp.float32)  # [1, HD]
        qbd = (head_mask * qrow).astype(jnp.bfloat16)  # [H, HD]
        s_raw = jax.lax.dot_general(
            qbd, kv_ref[0, r, :, :hd].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, T]
        s = s_raw * s_ref[0, r, :h].astype(jnp.float32) * scale
        s = jnp.where(valid, s, -1e30)
        m = jnp.max(s, axis=1, keepdims=True)  # [H, 1]
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=1, keepdims=True)  # [H, 1]
        pv = (p / denom) * s_ref[0, r, h:].astype(jnp.float32)  # [H, T]
        o_big = jax.lax.dot_general(
            pv.astype(jnp.bfloat16), kv_ref[0, r, :, hd:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, HD]
        o = jnp.sum(o_big * head_mask, axis=0, keepdims=True)  # [1, HD]
        o_ref[r] = o.astype(o_ref.dtype)


def packed_decode_attention_q8(
    q: jnp.ndarray,
    kv_all: jnp.ndarray,
    scale_all: jnp.ndarray,
    layer,
    valid_len,
    start=None,
    key_mask=None,
    rows_per_block: int = 0,
    chunk_t=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused decode attention over a packed int8 cache (``PackedQuantKVCache``).

    ``q [B, H, 1, D]``; ``kv_all [L, B, T, 2*H*D]`` int8 — the FULL stacked
    cache (``layer`` is a static int baked into the block index map, so no
    per-layer slice is materialized at the custom-call boundary);
    ``scale_all [L, B, 2H, T]`` per-(token, head) scales.
    Returns ``[B, H, 1, D]``. See :func:`_packed_attn_kernel_q8`.
    """
    b, h, tq, d = q.shape
    assert tq == 1, "packed kernel is single-token decode only"
    t = kv_all.shape[2]
    hd = h * d
    layer = int(layer)
    if chunk_t is None:
        import os as _os

        env = _os.environ.get("WMAR_PACKED_CHUNK")
        if env is not None:
            chunk_t = int(env)
        else:
            # Shape-aware default, both ends measured on-chip: OFF at image
            # shapes (24.9 vs 28.8 imgs/s at T=258 — the online-softmax
            # scratch carry + 3x grid steps cost more than the ~24% read
            # saving) and ON at long contexts (Chameleon-4k: 507/455 us vs
            # 657 flash-bf16 — and the single-block path's [RB, T, 2HD]
            # tile would blow VMEM anyway).
            chunk_t = 128 if t >= 1024 else 0
    if chunk_t and not interpret:
        # Mosaic requires lane-dim block sizes divisible by 128 (the scale
        # blocks chunk T on lanes), and kv sublane chunks divisible by 8.
        chunk_t = -(-chunk_t // 128) * 128
    # rb=4 measured fastest at the RAR shape (464 us vs 476 at rb=8/2 with
    # the tuned compiler params; rb=16 exceeds the remote compiler).
    # WMAR_PACKED_RB overrides for experiments.
    import os

    rb = rows_per_block or int(os.environ.get("WMAR_PACKED_RB", "0"))
    rb = rb or next(r for r in (4, 2, 1) if b % r == 0)
    lens = jnp.full((1,), valid_len, jnp.int32)
    starts = (jnp.zeros((b,), jnp.int32) if start is None
              else jnp.asarray(start, jnp.int32))
    # [B, H, 1, D] -> [B, 1, HD]: pure reshape (row-major order preserved)
    qp = q.reshape(b, 1, hd)
    if (start is not None or key_mask is not None) and not (chunk_t and chunk_t < t):
        raise ValueError(
            "start/key_mask support requires the chunked path (chunk_t < T); "
            "the dispatcher only routes masked calls at long contexts")

    # The batch-block grid dim is "arbitrary" (programs independent), and the
    # VMEM budget must fit TWO K/V block generations or Mosaic drops to
    # pipeline depth 1 and the DMA stream stops hiding compute.
    kwargs = {}

    def _params(ndims):
        # all dims "arbitrary": programs run sequentially, which the chunked
        # path's online-softmax scratch carry requires
        if interpret:
            return {}
        return {"compiler_params": pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * ndims,
            vmem_limit_bytes=100 * 1024 * 1024,
        )}

    if chunk_t and chunk_t < t:
        tc = chunk_t
        nc = -(-t // tc)

        def kv_map(i, c, lens, *_):
            return (layer, i, jnp.minimum(c, pl.cdiv(lens[0], tc) - 1), 0)

        def sc_map(i, c, lens, *_):
            return (layer, i, 0, jnp.minimum(c, pl.cdiv(lens[0], tc) - 1))

        def km_map(i, c, lens, *_):
            return (i, 0, jnp.minimum(c, pl.cdiv(lens[0], tc) - 1))

        in_specs = [
            pl.BlockSpec((rb, 1, hd), lambda i, c, *_: (i, 0, 0)),
            pl.BlockSpec((1, rb, tc, 2 * hd), kv_map),
            pl.BlockSpec((1, rb, 2 * h, tc), sc_map),
        ]
        args = [lens, starts, qp, kv_all, scale_all]
        kernel = _packed_attn_kernel_q8_chunked
        if key_mask is not None:
            # [B, 1, T]: the block's trailing dims become (1, tc) — a flat
            # [rb, tc] block violates Mosaic's last-two-dims tiling rule
            in_specs.append(pl.BlockSpec((rb, 1, tc), km_map))
            args.append(jnp.asarray(key_mask, jnp.bfloat16)[:, None, :])
            kernel = _packed_attn_kernel_q8_chunked_km

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, 1, hd), q.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,  # lens, starts
                grid=(b // rb, nc),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((rb, 1, hd), lambda i, c, *_: (i, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((rb, h, hd), jnp.float32),
                    pltpu.VMEM((rb, h, 128), jnp.float32),
                    pltpu.VMEM((rb, h, 128), jnp.float32),
                ],
            ),
            interpret=interpret,
            **_params(2),
        )(*args)
        return out.reshape(b, h, 1, d)

    out = pl.pallas_call(
        _packed_attn_kernel_q8,
        out_shape=jax.ShapeDtypeStruct((b, 1, hd), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # lens
            grid=(b // rb,),
            in_specs=[
                pl.BlockSpec((rb, 1, hd), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, rb, t, 2 * hd), lambda i, *_: (layer, i, 0, 0)),
                pl.BlockSpec((1, rb, 2 * h, t), lambda i, *_: (layer, i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((rb, 1, hd), lambda i, *_: (i, 0, 0)),
        ),
        interpret=interpret,
        **_params(1),
    )(lens, qp, kv_all, scale_all)
    return out.reshape(b, h, 1, d)


def _packed_attn_kernel_q8_chunked(len_ref, start_ref, q_ref, kv_ref, s_ref,
                                    o_ref, acc_ref, m_ref, l_ref):
    _chunked_body(len_ref, start_ref, q_ref, kv_ref, s_ref, None, o_ref,
                  acc_ref, m_ref, l_ref)


def _packed_attn_kernel_q8_chunked_km(len_ref, start_ref, q_ref, kv_ref, s_ref,
                                       km_ref, o_ref, acc_ref, m_ref, l_ref):
    _chunked_body(len_ref, start_ref, q_ref, kv_ref, s_ref, km_ref, o_ref,
                  acc_ref, m_ref, l_ref)


def _packed4_attn_kernel_chunked(len_ref, start_ref, q_ref, kv_ref, s_ref,
                                 o_ref, acc_ref, m_ref, l_ref):
    _chunked_body(len_ref, start_ref, q_ref, kv_ref, s_ref, None, o_ref,
                  acc_ref, m_ref, l_ref, is4=True)


def _packed4_attn_kernel_chunked_km(len_ref, start_ref, q_ref, kv_ref, s_ref,
                                    km_ref, o_ref, acc_ref, m_ref, l_ref):
    _chunked_body(len_ref, start_ref, q_ref, kv_ref, s_ref, km_ref, o_ref,
                  acc_ref, m_ref, l_ref, is4=True)


def _chunked_body(len_ref, start_ref, q_ref, kv_ref, s_ref, km_ref, o_ref,
                  acc_ref, m_ref, l_ref, is4: bool = False):
    """Chunked variant of :func:`_packed_attn_kernel_q8`: grid
    ``(B // RB, NC)`` with the T axis split into ``NC`` chunks and an online
    softmax carried in scratch across the chunk dimension.

    The point: decode attention normally reads the FULL padded cache every
    step, but early steps have ``valid_len << T``. The chunk block index is
    ``min(c, cdiv(valid_len, TC) - 1)`` — computed in the index map from the
    scalar-prefetched length — so once ``c`` passes the valid region the
    index stops changing and the pipeliner's revisit elision skips the DMA
    entirely (and ``@pl.when`` skips the compute). Averaged over a 256-step
    RAR generation the cache-read bytes drop ~35-50%; this is the "phased
    decode" idea (ROADMAP) done inside ONE program with zero program
    boundaries and token-exact results.

    Scratch: ``acc [RB, H, HD] f32``, ``m/l [RB, H, 128] f32`` (the running
    max / normalizer broadcast across lanes — scalar-per-head state stored
    lane-replicated, the standard TPU flash-attention idiom).

    ``start_ref [B]``: per-row first valid cache index (right-aligned ragged
    prompts); ``km_ref [RB, TC]`` optional per-(row, slot) validity as an
    additive 0/1 float mask (the fused-interleaved Chameleon CFG rows) —
    both make this kernel feature-complete for the llama decode path.

    ``is4`` selects the int4 payload layout (``Packed4QuantKVCache``): the
    kv block is ``[1, RB, TC, H*D]`` uint8 with K in the low nibble and V
    in the high nibble of the same byte (half the DMA bytes of the int8
    layout's ``[1, RB, TC, 2*H*D]``); the unpack widens to int32 FIRST —
    uint8 bit ops / uint8->bf16 casts trip the remote Mosaic toolchain.
    """
    _, rb, tc, hdk = kv_ref.shape
    hd = hdk if is4 else hdk // 2
    h = s_ref.shape[2] // 2
    d = hd // h
    scale = jnp.float32(d**-0.5)
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    n_valid = pl.cdiv(len_ref[0], tc)

    col = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 0)
    head_mask = (col // d == row).astype(jnp.float32)
    # global cache positions covered by this chunk (the block index the map
    # chose is min(c, n_valid-1), which equals c whenever compute runs)
    i = pl.program_id(0)
    pos = c * tc + jax.lax.broadcasted_iota(jnp.int32, (h, tc), 1)

    @pl.when(c == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(c < n_valid)
    def _chunk():
        for r in range(rb):
            if is4:
                ui = kv_ref[0, r].astype(jnp.int32)  # [TC, HD]
                k_chunk = ((ui & 0xF) - 8).astype(jnp.bfloat16)
                v_chunk = ((ui >> 4) - 8).astype(jnp.bfloat16)
            else:
                k_chunk = kv_ref[0, r, :, :hd].astype(jnp.bfloat16)
                v_chunk = kv_ref[0, r, :, hd:].astype(jnp.bfloat16)
            valid = (pos < len_ref[0]) & (pos >= start_ref[i * rb + r])
            qrow = q_ref[r].astype(jnp.float32)  # [1, HD]
            qbd = (head_mask * qrow).astype(jnp.bfloat16)  # [H, HD]
            s_raw = jax.lax.dot_general(
                qbd, k_chunk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [H, TC]
            sc = s_raw * s_ref[0, r, :h].astype(jnp.float32) * scale
            sc = jnp.where(valid, sc, -1e30)
            if km_ref is not None:
                # additive 0/1 float mask (bf16 bool compares trip Mosaic)
                sc = sc + (km_ref[r].astype(jnp.float32) - 1.0) * jnp.float32(1e30)
            m_prev = m_ref[r, :, :1]  # [H, 1]
            m_new = jnp.maximum(m_prev, jnp.max(sc, axis=1, keepdims=True))
            corr = jnp.exp(m_prev - m_new)  # [H, 1]
            p = jnp.exp(sc - m_new)  # [H, TC]
            pv = p * s_ref[0, r, h:].astype(jnp.float32)
            upd = jax.lax.dot_general(
                pv.astype(jnp.bfloat16), v_chunk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [H, HD]
            acc_ref[r] = acc_ref[r] * corr + upd
            l_ref[r] = l_ref[r] * corr + jnp.sum(p, axis=1, keepdims=True)
            m_ref[r] = jnp.broadcast_to(m_new, m_ref[r].shape)

    @pl.when(c == nc - 1)
    def _finalize():
        for r in range(rb):
            o = acc_ref[r] / l_ref[r, :, :1]  # [H, HD]
            o_ref[r] = jnp.sum(
                o * head_mask, axis=0, keepdims=True).astype(o_ref.dtype)


def _attn_body_q8(len_ref, start_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                  o_ref, km_ref=None):
    """int8-cache variant: K/V arrive quantized (int8 payload + per-token
    scales), dequantization happens in VMEM — HBM traffic for the cache is
    one quarter of the f32 path. Same math as `_attn_body`."""
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
    if km_ref is not None:
        s = s + (km_ref[0, 0].astype(jnp.float32) - 1.0) * jnp.float32(1e30)
    m = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=0, keepdims=True)
    o = jnp.dot(p.T, v, preferred_element_type=jnp.float32) / denom
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _decode_attn_kernel_q8(len_ref, start_ref, q_ref, k_ref, v_ref, ks_ref,
                           vs_ref, o_ref):
    _attn_body_q8(len_ref, start_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref)


def _decode_attn_kernel_q8_km(len_ref, start_ref, q_ref, k_ref, v_ref, ks_ref,
                              vs_ref, km_ref, o_ref):
    _attn_body_q8(len_ref, start_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                  o_ref, km_ref)


def flash_decode_attention_q8(
    q: jnp.ndarray,
    k_int8: jnp.ndarray,
    v_int8: jnp.ndarray,
    k_scale: jnp.ndarray,
    v_scale: jnp.ndarray,
    valid_len,
    start=None,
    key_mask=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused decode attention over a quantized cache.

    ``q [B, H, 1, D]``; ``k_int8/v_int8 [B, H, T, D]`` int8;
    ``k_scale/v_scale [B, H, T]`` per-token-head scales (QuantKVCache
    layout); ``key_mask`` optional ``[B, T]``. Returns ``[B, H, 1, D]``.
    """
    b, h, _, d = q.shape
    t = k_int8.shape[2]
    lens = jnp.full((1,), valid_len, jnp.int32)
    starts = (
        jnp.zeros((b,), jnp.int32) if start is None else jnp.asarray(start, jnp.int32)
    )
    # rank-4 scales: rank-1 blocks trip Mosaic (see _attn_body note)
    ks = k_scale[..., None]
    vs = v_scale[..., None]
    in_specs = [
        pl.BlockSpec((1, 1, 1, d), lambda i, j, *_: (i, j, 0, 0)),
        pl.BlockSpec((1, 1, t, d), lambda i, j, *_: (i, j, 0, 0)),
        pl.BlockSpec((1, 1, t, d), lambda i, j, *_: (i, j, 0, 0)),
        pl.BlockSpec((1, 1, t, 1), lambda i, j, *_: (i, j, 0, 0)),
        pl.BlockSpec((1, 1, t, 1), lambda i, j, *_: (i, j, 0, 0)),
    ]
    args = [lens, starts, q, k_int8, v_int8, ks, vs]
    kernel = _decode_attn_kernel_q8
    if key_mask is not None:
        km = jnp.broadcast_to(
            jnp.asarray(key_mask, jnp.bfloat16)[:, None, :, None], (b, h, t, 1))
        in_specs.append(pl.BlockSpec((1, 1, t, 1), lambda i, j, *_: (i, j, 0, 0)))
        args.append(km)
        kernel = _decode_attn_kernel_q8_km

    grid = (b, h)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, 1, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, 1, d), lambda i, j, *_: (i, j, 0, 0)),
        ),
        interpret=interpret,
    )(*args)
    return out


def _dma_probe_kernel(q_ref, kv_ref, s_ref, o_ref):
    """Diagnostic body: touch the streamed blocks with near-zero compute."""
    _, rb, t, hd2 = kv_ref.shape
    hd = hd2 // 2
    for r in range(rb):
        row = kv_ref[0, r, :1, :hd].astype(jnp.float32)  # [1, HD]
        o_ref[r] = (row + s_ref[0, r, :1, :1].astype(jnp.float32)).astype(o_ref.dtype)


def _packed_dma_probe(q, kv_all, scale_all, layer, rows_per_block: int = 4,
                      interpret: bool = False):
    """Bandwidth diagnostic for the packed kernel (bench_attention only):
    identical grid/blocks to :func:`packed_decode_attention_q8` but the body
    reads one row per block. Its runtime is the pure DMA + pipeline cost;
    the gap to the real kernel is compute/lowering, not bandwidth."""
    b, h, tq, d = q.shape
    t = kv_all.shape[2]
    hd = h * d
    layer = int(layer)
    rb = rows_per_block
    qp = q.reshape(b, 1, hd)
    kwargs = {} if interpret else {"compiler_params": pltpu.CompilerParams(
        dimension_semantics=("arbitrary",), vmem_limit_bytes=100 * 1024 * 1024)}
    out = pl.pallas_call(
        _dma_probe_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1, hd), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b // rb,),
            in_specs=[
                pl.BlockSpec((rb, 1, hd), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, rb, t, 2 * hd), lambda i: (layer, i, 0, 0)),
                pl.BlockSpec((1, rb, 2 * h, t), lambda i: (layer, i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((rb, 1, hd), lambda i: (i, 0, 0)),
        ),
        interpret=interpret,
        **kwargs,
    )(qp, kv_all, scale_all)
    return out.reshape(b, h, 1, d)


def sharded_packed_decode_attention(
    q: jnp.ndarray,
    cache,
    layer,
    valid_len,
    start=None,
    key_mask=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Packed-cache decode attention on a MULTI-CHIP mesh via ``shard_map``.

    A bare ``pallas_call`` has no SPMD partitioning rule, so under ``jit``
    with sharded operands XLA would all-gather the whole cache at the custom
    call — the reason the packed kernels were single-chip-only until now.
    ``shard_map`` localizes instead: each chip runs the unchanged kernel on
    its own shard, with zero collectives (decode attention is pointwise over
    both batch and heads).

    * ``dp`` shards the batch: every chip sees a ``[B/dp, ...]`` packed
      cache — valid as-is, any ``tp_groups``-free layout works.
    * ``tp`` shards heads: requires the cache built with
      ``tp_groups == mesh.shape[tp]`` (grouped ``[K_g|V_g]`` lane order, see
      :class:`~wmar_tpu.engine.kvcache.PackedQuantKVCache`) so each chip's
      lane slice is a self-contained packed cache over its local heads.

    The mesh/axis context rides on the cache (``cache.mesh`` etc., set at
    ``KVCache.zeros``). ``q [B, H, 1, D]`` global; returns ``[B, H, 1, D]``
    with the same sharding as ``q``. The reference reaches the same end by
    pinning one paged-cache worker per GPU rank and all-reducing activations
    (``deps/chameleon/inference/transformer.py:159,220``); here the per-chip
    locality is declared and XLA keeps activations sharded.
    """
    from jax.sharding import PartitionSpec as P

    from wmar_tpu.engine.kvcache import Packed4QuantKVCache

    mesh = cache.mesh
    dp, tp = cache.dp_axis, cache.tp_axis
    ntp = mesh.shape[tp] if tp else 1
    if cache.tp_groups != ntp:
        raise ValueError(
            f"cache tp_groups={cache.tp_groups} != mesh tp={ntp}; build the "
            "cache with KVCache.zeros(..., mesh=mesh, tp_axis=...)")
    is4 = isinstance(cache, Packed4QuantKVCache)
    vl = jnp.full((1,), valid_len, jnp.int32)

    has_start = start is not None
    has_km = key_mask is not None
    in_specs = [P(dp, tp, None, None), P(None, dp, None, tp),
                P(None, dp, tp, None), P()]
    args = [q, cache.kv, cache.scale, vl]
    if has_start:
        in_specs.append(P(dp))
        args.append(jnp.asarray(start, jnp.int32))
    if has_km:
        in_specs.append(P(dp, None))
        args.append(jnp.asarray(key_mask))

    def body(q_l, kv_l, s_l, vl_l, *rest):
        st = rest[0] if has_start else None
        km = rest[-1] if has_km else None
        if is4:
            return packed4_decode_attention(
                q_l, kv_l, s_l, layer, vl_l[0], start=st, key_mask=km,
                interpret=interpret)
        return packed_decode_attention_q8(
            q_l, kv_l, s_l, layer, vl_l[0], start=st, key_mask=km,
            interpret=interpret)

    return jax.shard_map(
        body, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=P(dp, tp, None, None), check_vma=False,
    )(*args)


def _packed4_attn_kernel(len_ref, q_ref, kv_ref, s_ref, o_ref):
    """int4 variant of :func:`_packed_attn_kernel_q8`: the block is ONE
    ``[1, RB, T, H*D]`` uint8 tile whose low nibbles are K and high nibbles
    V for the same (t, h, d) — half the DMA bytes; the unpack is two VPU
    passes the DMA stream hides (the int8 kernel's DMA-only probe runs
    within 10% of its full time, so bytes are the binding constraint)."""
    _, rb, t, hd = kv_ref.shape
    h = s_ref.shape[2] // 2
    d = hd // h
    scale = jnp.float32(d**-0.5)

    col = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 0)
    head_mask = (col // d == row).astype(jnp.float32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (h, t), 1)
    valid = pos < len_ref[0]

    for r in range(rb):
        # widen FIRST: uint8 bit ops and uint8->bf16 casts both trip the
        # remote Mosaic toolchain; int32 mask/shift lowers cleanly
        ui = kv_ref[0, r].astype(jnp.int32)  # [T, HD]
        k = ((ui & 0xF) - 8).astype(jnp.bfloat16)
        v = ((ui >> 4) - 8).astype(jnp.bfloat16)
        qrow = q_ref[r].astype(jnp.float32)  # [1, HD]
        qbd = (head_mask * qrow).astype(jnp.bfloat16)  # [H, HD]
        s_raw = jax.lax.dot_general(
            qbd, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [H, T]
        sc = s_raw * s_ref[0, r, :h].astype(jnp.float32) * scale
        sc = jnp.where(valid, sc, -1e30)
        m = jnp.max(sc, axis=1, keepdims=True)
        p = jnp.exp(sc - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        pv = (p / denom) * s_ref[0, r, h:].astype(jnp.float32)
        o_big = jax.lax.dot_general(
            pv.astype(jnp.bfloat16), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [H, HD]
        o = jnp.sum(o_big * head_mask, axis=0, keepdims=True)
        o_ref[r] = o.astype(o_ref.dtype)


def packed4_decode_attention(
    q: jnp.ndarray,
    kv_all: jnp.ndarray,
    scale_all: jnp.ndarray,
    layer,
    valid_len,
    start=None,
    key_mask=None,
    rows_per_block: int = 0,
    chunk_t=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused decode attention over a ``Packed4QuantKVCache``.

    ``q [B, H, 1, D]``; ``kv_all [L, B, T, H*D]`` uint8 (K low / V high
    nibbles); ``scale_all [L, B, 2H, T]``. Returns ``[B, H, 1, D]``.

    Long contexts (``T >= 1024``, same shape-aware default as the int8
    wrapper) take the chunked online-softmax path, which also carries
    ``start`` (ragged right-aligned prompts) and ``key_mask`` (per-row slot
    validity, e.g. Chameleon CFG rows) — the serving feature set the XLA
    fallback otherwise provides by materializing ~2x bf16 K/V per layer
    step, prohibitive at 7B decode shapes.
    """
    b, h, tq, d = q.shape
    assert tq == 1, "packed kernel is single-token decode only"
    t = kv_all.shape[2]
    hd = h * d
    layer = int(layer)
    import os as _os

    if chunk_t is None:
        env = _os.environ.get("WMAR_PACKED_CHUNK")
        chunk_t = int(env) if env is not None else (128 if t >= 1024 else 0)
    if chunk_t and not interpret:
        chunk_t = -(-chunk_t // 128) * 128
    rb = rows_per_block or int(_os.environ.get("WMAR_PACKED_RB", "0"))
    rb = rb or next(r for r in (4, 2, 1) if b % r == 0)
    lens = jnp.full((1,), valid_len, jnp.int32)
    qp = q.reshape(b, 1, hd)
    if (start is not None or key_mask is not None) and not (chunk_t and chunk_t < t):
        raise ValueError(
            "start/key_mask support requires the chunked path (chunk_t < T); "
            "the dispatcher only routes masked calls at long contexts")

    def _params(ndims):
        if interpret:
            return {}
        return {"compiler_params": pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * ndims,
            vmem_limit_bytes=100 * 1024 * 1024)}

    if chunk_t and chunk_t < t:
        tc = chunk_t
        nc = -(-t // tc)
        starts = (jnp.zeros((b,), jnp.int32) if start is None
                  else jnp.asarray(start, jnp.int32))

        def kv_map(i, c, lens, *_):
            return (layer, i, jnp.minimum(c, pl.cdiv(lens[0], tc) - 1), 0)

        def sc_map(i, c, lens, *_):
            return (layer, i, 0, jnp.minimum(c, pl.cdiv(lens[0], tc) - 1))

        def km_map(i, c, lens, *_):
            return (i, 0, jnp.minimum(c, pl.cdiv(lens[0], tc) - 1))

        in_specs = [
            pl.BlockSpec((rb, 1, hd), lambda i, c, *_: (i, 0, 0)),
            pl.BlockSpec((1, rb, tc, hd), kv_map),
            pl.BlockSpec((1, rb, 2 * h, tc), sc_map),
        ]
        args = [lens, starts, qp, kv_all, scale_all]
        kernel = _packed4_attn_kernel_chunked
        if key_mask is not None:
            in_specs.append(pl.BlockSpec((rb, 1, tc), km_map))
            args.append(jnp.asarray(key_mask, jnp.bfloat16)[:, None, :])
            kernel = _packed4_attn_kernel_chunked_km

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, 1, hd), q.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,  # lens, starts
                grid=(b // rb, nc),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((rb, 1, hd), lambda i, c, *_: (i, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((rb, h, hd), jnp.float32),
                    pltpu.VMEM((rb, h, 128), jnp.float32),
                    pltpu.VMEM((rb, h, 128), jnp.float32),
                ],
            ),
            interpret=interpret,
            **_params(2),
        )(*args)
        return out.reshape(b, h, 1, d)

    out = pl.pallas_call(
        _packed4_attn_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1, hd), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // rb,),
            in_specs=[
                pl.BlockSpec((rb, 1, hd), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, rb, t, hd), lambda i, *_: (layer, i, 0, 0)),
                pl.BlockSpec((1, rb, 2 * h, t), lambda i, *_: (layer, i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((rb, 1, hd), lambda i, *_: (i, 0, 0)),
        ),
        interpret=interpret,
        **_params(1),
    )(lens, qp, kv_all, scale_all)
    return out.reshape(b, h, 1, d)
