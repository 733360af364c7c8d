"""Llama-style transformer (Chameleon/Anole-7B backbone), TPU-native.

Re-implements the architecture of ``deps/chameleon/inference/transformer.py``
— RMSNorm pre-norm blocks, rotary embeddings, SwiGLU FFN, optional per-head
qk-LayerNorm (Chameleon setting), GQA-capable — as pure functions over a
param pytree, with a preallocated KV cache and per-row start offsets for
right-aligned ragged prompts.

The reference shards this model across GPU workers with explicit
``dist.all_reduce`` after attention/FFN and all-gathered sharded embeddings
(``transformer.py:159,220,324-336``). Here tensor parallelism is pure
sharding metadata (:func:`llama_tp_specs`); XLA inserts the equivalent
collectives over ICI when params are placed on a ``tp`` mesh axis.

Chameleon-7B config: dim 4096, 32 layers/heads, ffn 11008, qk_normalization,
vocab 65536 (``models/7b/params.json``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from wmar_tpu.engine.attention import decode_attention
from wmar_tpu.engine.kvcache import KVCache
from wmar_tpu.ops import wquant


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: Optional[int] = None
    vocab_size: int = 65536
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    qk_normalization: bool = True
    # Moshi-style residual LayerScale (diagonal per-channel scales on both
    # residual branches, ``moshi/modules/transformer.py:77,545-552``).
    layer_scale: bool = False

    @property
    def kv_heads(self) -> int:
        return self.n_kv_heads or self.n_heads

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def ffn_hidden(self) -> int:
        hidden = int(2 * (4 * self.dim) / 3)
        if self.ffn_dim_multiplier is not None:
            hidden = int(self.ffn_dim_multiplier * hidden)
        return self.multiple_of * ((hidden + self.multiple_of - 1) // self.multiple_of)


CHAMELEON_7B = LlamaConfig()


def init_llama_params(rng: jax.Array, cfg: LlamaConfig, dtype=jnp.float32):
    """Random init (one jitted XLA program; see rar.py note)."""
    import functools

    return jax.jit(functools.partial(_init_impl, cfg=cfg, dtype=dtype))(rng)


def _init_impl(rng: jax.Array, cfg: LlamaConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(rng, 4 + 8 * cfg.n_layers))

    def mat(n_in, n_out):
        return (jax.random.normal(next(keys), (n_in, n_out)) * (n_in**-0.5)).astype(dtype)

    d, hd = cfg.dim, cfg.head_dim
    blocks = []
    for _ in range(cfg.n_layers):
        blk = {
            "attention_norm": jnp.ones((d,), dtype),
            "ffn_norm": jnp.ones((d,), dtype),
            "wq": mat(d, cfg.n_heads * hd),
            "wk": mat(d, cfg.kv_heads * hd),
            "wv": mat(d, cfg.kv_heads * hd),
            "wo": mat(cfg.n_heads * hd, d),
            "w1": mat(d, cfg.ffn_hidden),
            "w3": mat(d, cfg.ffn_hidden),
            "w2": mat(cfg.ffn_hidden, d),
        }
        if cfg.qk_normalization:
            blk["q_norm"] = {"scale": jnp.ones((hd,), dtype), "bias": jnp.zeros((hd,), dtype)}
            blk["k_norm"] = {"scale": jnp.ones((hd,), dtype), "bias": jnp.zeros((hd,), dtype)}
        if cfg.layer_scale:
            blk["ls1"] = jnp.full((d,), 1e-4, dtype)
            blk["ls2"] = jnp.full((d,), 1e-4, dtype)
        blocks.append(blk)
    return {
        "tok_embeddings": mat(cfg.vocab_size, d) * 0.02 * (cfg.vocab_size**0.5),
        "blocks": blocks,
        "norm": jnp.ones((d,), dtype),
        "output": mat(d, cfg.vocab_size),
    }


def _rms(x, scale, eps):
    var = (x.astype(jnp.float32) ** 2).mean(-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale


def _ln(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Llama rotary embedding on adjacent pairs. ``x [B, t, H, D]``,
    ``positions [B, t]`` (per-row, so left padding shifts correctly)."""
    b, t, h, d = x.shape
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))  # [d/2]
    ang = positions[..., None].astype(jnp.float32) * freqs  # [B, t, d/2]
    cos, sin = jnp.cos(ang)[:, :, None, :], jnp.sin(ang)[:, :, None, :]
    xr = x.reshape(b, t, h, d // 2, 2)
    x0, x1 = xr[..., 0], xr[..., 1]
    out = jnp.stack([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    return out.reshape(b, t, h, d).astype(x.dtype)


# Pallas flash-decode for single-token steps. Measured end-to-end at the
# Chameleon-4k decode shape (tools/bench_llama_e2e.py, real chip): 1.09x vs
# XLA with a bf16 cache (5.37 vs 5.88 ms/step), 1.21x with int8 — but a
# loss at short caches, where XLA's fused attention wins. Default is
# therefore AUTO: kernel when the cache has >= 2048 slots, XLA below.
# WMAR_FLASH_DECODE=1/0 forces; None = auto (bench tooling may also set the
# module flag directly).
USE_FLASH_DECODE = {"1": True, "0": False}.get(
    os.environ.get("WMAR_FLASH_DECODE", "auto"))
FLASH_DECODE_MIN_CACHE = 2048


def _flash_enabled(cache_len: int) -> bool:
    if USE_FLASH_DECODE is not None:
        return USE_FLASH_DECODE
    # auto: single-device only — a bare pallas_call on a TP-sharded cache
    # has no partitioning rule, so XLA would replicate (all-gather) the
    # whole cache per layer-step; multi-chip serving keeps the XLA path
    # unless WMAR_FLASH_DECODE=1 is forced knowingly
    return cache_len >= FLASH_DECODE_MIN_CACHE and jax.device_count() == 1


def _cache_attention(q, cache, li, valid_len, start, key_mask):
    from wmar_tpu.engine.kvcache import Packed4QuantKVCache, PackedQuantKVCache

    if isinstance(cache, (PackedQuantKVCache, Packed4QuantKVCache)):
        # packed caches route through the shared dispatcher: the chunked
        # packed kernel measured 507/455 us at the Chameleon-4k decode shape
        # vs 657 us flash-bf16 (PERFORMANCE.md), with start/key_mask support
        from wmar_tpu.engine.attention import cached_decode_attention

        return cached_decode_attention(q, cache, li, valid_len,
                                       start=start, key_mask=key_mask)
    if q.shape[2] == 1 and _flash_enabled(cache.max_len):
        from wmar_tpu.engine.kvcache import QuantKVCache
        from wmar_tpu.ops.flash_decode import (
            flash_decode_attention,
            flash_decode_attention_q8,
        )

        interpret = jax.default_backend() != "tpu"
        if isinstance(cache, QuantKVCache):
            return flash_decode_attention_q8(
                q, cache.k[li], cache.v[li], cache.k_scale[li],
                cache.v_scale[li], valid_len, start=start, key_mask=key_mask,
                interpret=interpret,
            )
        k_all, v_all = cache.layer(li)
        return flash_decode_attention(q, k_all, v_all, valid_len, start=start,
                                      key_mask=key_mask, interpret=interpret)
    k_all, v_all = cache.layer(li)
    return decode_attention(q, k_all, v_all, valid_len, start=start,
                            key_mask=key_mask)


def llama_forward(
    params,
    cfg: LlamaConfig,
    tokens: jnp.ndarray,
    cache: KVCache,
    write_pos,
    positions: jnp.ndarray,
    start: Optional[jnp.ndarray] = None,
    key_mask: Optional[jnp.ndarray] = None,
    attn_fn=None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Forward ``tokens [B, t]`` written into the cache at ``write_pos``.

    ``positions [B, t]``: rope positions (prompt-relative, pads excluded).
    ``start [B]``: first valid cache index per row (left-pad masking).
    ``key_mask [B, T_max]``: optional per-position validity (CFG rows over a
    shared token history). ``attn_fn``: optional attention override called as
    ``attn_fn(q, k, v, li)`` with the *fresh* (pre-cache) per-layer k/v —
    used by :func:`llama_prefill_sp` for ring-attention sequence-parallel
    prefill. Returns ``(logits [B, t, vocab] fp32, cache)``.
    """
    b, t = tokens.shape
    x = params["tok_embeddings"][tokens]

    for li, blk in enumerate(params["blocks"]):
        q, k, v = block_attn_inputs(blk, cfg, x, positions)
        cache = cache.write(li, write_pos, k, v)
        if attn_fn is not None:
            attn = attn_fn(q, k, v, li)
        else:
            attn = _cache_attention(q, cache, li, jnp.asarray(write_pos) + t,
                                    start, key_mask)
        x = block_finish(blk, cfg, x, attn)

    x = _rms(x, params["norm"], cfg.norm_eps)
    logits = wquant.matmul(x, params["output"]).astype(jnp.float32)
    return logits, cache


def block_attn_inputs(blk, cfg: LlamaConfig, x: jnp.ndarray, positions: jnp.ndarray):
    """Pre-attention half of one transformer block: norms, qkv projections,
    rope, GQA head repeat. ``x [B, t, dim]`` -> ``q, k, v [B, H, t, D]``.
    Shared by :func:`llama_forward` and the pipeline-parallel stage body
    (:mod:`wmar_tpu.parallel.pipeline`) so the math cannot diverge."""
    b, t = x.shape[:2]
    n_rep = cfg.n_heads // cfg.kv_heads
    h = _rms(x, blk["attention_norm"], cfg.norm_eps)
    # wquant.matmul: plain matrix or weight-only-int8 {"q","s"} dict
    q = wquant.matmul(h, blk["wq"]).reshape(b, t, cfg.n_heads, cfg.head_dim)
    k = wquant.matmul(h, blk["wk"]).reshape(b, t, cfg.kv_heads, cfg.head_dim)
    v = wquant.matmul(h, blk["wv"]).reshape(b, t, cfg.kv_heads, cfg.head_dim)
    if cfg.qk_normalization:
        q = _ln(q, blk["q_norm"], cfg.norm_eps)
        k = _ln(k, blk["k_norm"], cfg.norm_eps)
    q = apply_rope(q, positions, cfg.rope_theta)
    k = apply_rope(k, positions, cfg.rope_theta)
    if n_rep > 1:
        k = jnp.repeat(k, n_rep, axis=2)
        v = jnp.repeat(v, n_rep, axis=2)
    q, k, v = (z.transpose(0, 2, 1, 3) for z in (q, k, v))
    return q, k, v


def block_finish(blk, cfg: LlamaConfig, x: jnp.ndarray, attn: jnp.ndarray) -> jnp.ndarray:
    """Post-attention half of one block: output projection, residuals,
    SwiGLU FFN, optional LayerScale. ``attn [B, H, t, D]`` -> new ``x``."""
    b, t = x.shape[:2]
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, cfg.n_heads * cfg.head_dim)
    attn_out = wquant.matmul(attn, blk["wo"])
    x = x + (blk["ls1"] * attn_out if cfg.layer_scale else attn_out)

    h2 = _rms(x, blk["ffn_norm"], cfg.norm_eps)
    ffn_out = wquant.matmul(
        jax.nn.silu(wquant.matmul(h2, blk["w1"])) * wquant.matmul(h2, blk["w3"]),
        blk["w2"])
    return x + (blk["ls2"] * ffn_out if cfg.layer_scale else ffn_out)


def llama_prefill_sp(
    params,
    cfg: LlamaConfig,
    tokens: jnp.ndarray,
    cache: KVCache,
    positions: jnp.ndarray,
    mesh,
    *,
    sp_axis: str = "sp",
    tp_axis: Optional[str] = None,
    dp_axis: Optional[str] = None,
    start: Optional[jnp.ndarray] = None,
    key_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Sequence-parallel prefill: ``llama_forward`` at ``write_pos=0`` with
    ring attention over the ``sp`` mesh axis.

    Shard ``tokens``/``positions`` as ``P(dp, sp)`` in the calling jit; the
    position-wise linears then run sequence-sharded for free (they never mix
    positions), attention rotates KV blocks around the sp ring, and the one
    all-gather per layer happens at the cache write — where it is needed
    anyway for the later single-token decode. ``T % mesh.shape[sp_axis]``
    must be 0 (pad the prompt; mask pads via ``key_mask``/``start``).

    The reference has no counterpart: its prefill runs fully replicated on
    every worker (``deps/chameleon/inference/generation.py``).
    """
    from wmar_tpu.parallel.ring import ring_prefill_attention

    t = tokens.shape[1]
    km = key_mask[:, :t] if key_mask is not None else None

    def attn_fn(q, k, v, li):
        return ring_prefill_attention(
            q, k, v, mesh, sp_axis=sp_axis, tp_axis=tp_axis, dp_axis=dp_axis,
            start=start, key_mask=km,
        )

    return llama_forward(params, cfg, tokens, cache, 0, positions,
                         start=start, key_mask=key_mask, attn_fn=attn_fn)


WEIGHT_KEYS = ("wq", "wk", "wv", "wo", "w1", "w3", "w2")


def quantize_llama_params_int8(params, compute_dtype=None, donate=False,
                               bits=8):
    """Weight-only int8 for every block linear + the vocab head.

    7B Chameleon: bf16 weights are ~14 GB — larger than one v5e's HBM; int8
    (~7 GB) fits a single chip with room for the KV cache, and under TP the
    per-chip weight stream halves. ``tok_embeddings`` stays float (gather,
    not matmul). Composes with :func:`llama_tp_specs` — quantized leaves get
    megatron specs with the per-output-channel scale sharded alongside the
    output dim.

    ``donate=True`` frees each float device buffer as soon as it has been
    quantized (``Array.delete()``) and quantizes ON DEVICE: at 7B the bf16
    tree (~14 GB) plus a growing int8 copy exceeds one v5e's HBM, so
    quantizing after a full-geometry on-device init only fits if the walk
    is destructive — and the host-roundtrip quantizer would drag ~14 GB
    over the (tunneled) link. The input tree must not be used afterwards.

    ``bits=4`` switches to grouped int4 (``{"q4","s4"}`` leaves, group 128
    along the contraction — `wmar_tpu.ops.wquant.quantize_matrix_int4`):
    ~3.5 GB of weight reads per 7B decode step instead of 7, the HBM-bound
    regime's next halving. Token drift is larger than int8's; measured by
    the same greedy-agreement tests, never assumed.
    """
    def quant(v):
        if donate and isinstance(v, jax.Array):
            q = wquant.quantize_matrix(v, bits=bits, device=True)
            v.delete()
            return q
        return wquant.quantize_matrix(v, bits=bits)

    out = dict(params)
    out["blocks"] = [
        {k: (quant(v) if k in WEIGHT_KEYS else v) for k, v in blk.items()}
        for blk in params["blocks"]
    ]
    out["output"] = quant(params["output"])
    if compute_dtype is not None:
        out["tok_embeddings"] = jnp.asarray(params["tok_embeddings"]).astype(compute_dtype)
        out["norm"] = jnp.asarray(params["norm"]).astype(compute_dtype)
        out["blocks"] = wquant.cast_float_leaves(out["blocks"], compute_dtype)
    return out


def llama_tp_specs(params: dict) -> dict:
    """Megatron sharding: column-parallel wq/wk/wv/w1/w3 + vocab output,
    row-parallel wo/w2 — XLA inserts the reference's manual all-reduces.

    Weight-only-int8 leaves (``{"q","s"}`` dicts) shard the same way: the
    int8 matrix gets the matrix spec; the per-output-channel scale shards
    with the output dim (column-parallel) or replicates (row-parallel,
    where the output dim is unsharded). Grouped-int4 leaves
    (``{"q4","s4"}``: nibbles ``[gc, G/2, n_out]``, scales ``[gc, n_out]``)
    shard the within-group byte axis where the input dim was sharded (the
    group-count axis can be as small as 1, the byte axis is always >= 16;
    XLA all-reduces the split partial dots exactly like row-parallel int8)
    and the trailing dim where the output dim was."""

    def mat_spec(w, spec: P) -> object:
        if isinstance(w, dict):
            in_axis, out_axis = spec[0], spec[1]
            if "q4" in w:  # grouped int4: [gc, G/2, n_out] + [gc, n_out]
                return {"q4": P(None, in_axis, out_axis),
                        "s4": P(None, out_axis)}
            return {"q": spec, "s": P(out_axis)}
        return spec

    def block_spec(blk):
        spec = {
            "attention_norm": P(),
            "ffn_norm": P(),
            "wq": P(None, "tp"),
            "wk": P(None, "tp"),
            "wv": P(None, "tp"),
            "wo": P("tp", None),
            "w1": P(None, "tp"),
            "w3": P(None, "tp"),
            "w2": P("tp", None),
        }
        spec = {k: (mat_spec(blk[k], v) if k in WEIGHT_KEYS else v)
                for k, v in spec.items()}
        if "q_norm" in blk:
            spec["q_norm"] = {"scale": P(), "bias": P()}
            spec["k_norm"] = {"scale": P(), "bias": P()}
        if "ls1" in blk:
            spec["ls1"] = P()
            spec["ls2"] = P()
        return spec

    return {
        "tok_embeddings": P("tp", None),
        "blocks": [block_spec(b) for b in params["blocks"]],
        "norm": P(),
        "output": mat_spec(params["output"], P(None, "tp")),
    }
