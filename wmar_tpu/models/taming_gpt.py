"""Taming's class-conditional image GPT (minGPT), TPU-native.

Functional re-implementation of the architecture consumed by wmar's Taming
path (reference: ``deps/taming/modules/transformer/mingpt.py`` — GPT with
learned positional embeddings, pre-LN blocks, GELU MLP, untied lm head).
Parameters are a plain pytree so the decode scan stays a pure function; a
converter from the original PyTorch checkpoint lives in
``wmar_tpu.utils.convert``.

The published ImageNet cin_transformer config: vocab 16384 VQ codes + 1000
class tokens (class token id = 16384 + class), block_size 512, 48 layers,
d=1664 (GPT-1.4B "cin_transformer"); tests use tiny configs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wmar_tpu.engine.attention import cached_decode_attention, prefill_attention
from wmar_tpu.engine.kvcache import KVCache
from wmar_tpu.ops import wquant


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    vocab_size: int
    block_size: int
    n_layer: int
    n_head: int
    n_embd: int

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head


def init_gpt_params(rng: jax.Array, cfg: GPTConfig, dtype=jnp.float32):
    """Random init matching the reference's normal(0, 0.02) scheme.

    Jitted as one XLA program — eager per-leaf init is pathologically slow
    on remote-compile TPU backends."""
    import functools

    return jax.jit(functools.partial(_init_gpt_params_impl, cfg=cfg, dtype=dtype))(rng)


def _init_gpt_params_impl(rng: jax.Array, cfg: GPTConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(rng, 4 + 8 * cfg.n_layer))

    def normal(shape):
        return (jax.random.normal(next(keys), shape) * 0.02).astype(dtype)

    def linear(n_in, n_out):
        return {"w": normal((n_in, n_out)), "b": jnp.zeros((n_out,), dtype)}

    blocks = []
    for _ in range(cfg.n_layer):
        blocks.append(
            {
                "ln1": {"scale": jnp.ones((cfg.n_embd,), dtype), "bias": jnp.zeros((cfg.n_embd,), dtype)},
                "ln2": {"scale": jnp.ones((cfg.n_embd,), dtype), "bias": jnp.zeros((cfg.n_embd,), dtype)},
                "attn": {
                    "q": linear(cfg.n_embd, cfg.n_embd),
                    "k": linear(cfg.n_embd, cfg.n_embd),
                    "v": linear(cfg.n_embd, cfg.n_embd),
                    "proj": linear(cfg.n_embd, cfg.n_embd),
                },
                "mlp": {
                    "fc": linear(cfg.n_embd, 4 * cfg.n_embd),
                    "proj": linear(4 * cfg.n_embd, cfg.n_embd),
                },
            }
        )
    return {
        "tok_emb": normal((cfg.vocab_size, cfg.n_embd)),
        "pos_emb": jnp.zeros((cfg.block_size, cfg.n_embd), dtype),
        "blocks": blocks,
        "ln_f": {"scale": jnp.ones((cfg.n_embd,), dtype), "bias": jnp.zeros((cfg.n_embd,), dtype)},
        "head": normal((cfg.n_embd, cfg.vocab_size)),  # no bias, untied
    }


def _ln(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _linear(x, p):
    # {"w","b"} or weight-only int8 {"w_q","w_scale","b"} (ops/wquant.py)
    return wquant.linear(x, p)


def quantize_gpt_params_int8(params, compute_dtype=None, bits=8):
    """Weight-only int8 for every decode-path linear + the untied head.

    Same serving lever as :func:`wmar_tpu.models.rar.quantize_rar_params_int8`
    — per-output-channel absmax, embeddings/norms stay float (cast to
    ``compute_dtype`` when given, which seeds the activation dtype).
    The published cin_transformer (48L x 1664d, 1.4B) reads ~2.8 GB of bf16
    weights per decode step; int8 halves that, ``bits=4`` (grouped int4,
    falls back per-matrix on indivisible dims) halves it again.
    """
    q = lambda p: wquant.quantize_linear(p, bits=bits, compute_dtype=compute_dtype)
    out = dict(params)
    out["blocks"] = [
        {
            **blk,
            "attn": {k: q(v) for k, v in blk["attn"].items()},
            "mlp": {k: q(v) for k, v in blk["mlp"].items()},
        }
        for blk in params["blocks"]
    ]
    out["head"] = wquant.quantize_matrix(params["head"], bits=bits)
    if compute_dtype is not None:
        for key in ("tok_emb", "pos_emb"):
            out[key] = jnp.asarray(params[key]).astype(compute_dtype)
        out["blocks"] = wquant.cast_float_leaves(out["blocks"], compute_dtype)
        out["ln_f"] = wquant.cast_float_leaves(out["ln_f"], compute_dtype)
    return out


def _split_heads(x, n_head):
    b, t, c = x.shape
    return x.reshape(b, t, n_head, c // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def gpt_forward(
    params,
    cfg: GPTConfig,
    tokens: jnp.ndarray,
    cache: Optional[KVCache] = None,
    start_pos=0,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Forward ``tokens [B, t]`` at absolute position ``start_pos``.

    With a cache: appends the new K/V at ``start_pos`` and attends against
    the full (masked) cache — both the prefill and the 1-token decode path.
    Without a cache: plain causal attention (training/scoring mode).

    Returns ``(logits [B, t, vocab], cache)``.
    """
    b, t = tokens.shape
    x = params["tok_emb"][tokens]
    pos = jnp.asarray(start_pos, jnp.int32) + jnp.arange(t)
    x = x + params["pos_emb"][pos]

    for li, blk in enumerate(params["blocks"]):
        h = _ln(x, blk["ln1"])
        q = _split_heads(_linear(h, blk["attn"]["q"]), cfg.n_head)
        k = _split_heads(_linear(h, blk["attn"]["k"]), cfg.n_head)
        v = _split_heads(_linear(h, blk["attn"]["v"]), cfg.n_head)
        if cache is not None:
            cache = cache.write(li, start_pos, k, v)
            attn = cached_decode_attention(q, cache, li, jnp.asarray(start_pos) + t)
        else:
            attn = prefill_attention(q, k, v, causal=True)
        x = x + _linear(_merge_heads(attn), blk["attn"]["proj"])
        h2 = _ln(x, blk["ln2"])
        h2 = jax.nn.gelu(_linear(h2, blk["mlp"]["fc"]), approximate=False)
        x = x + _linear(h2, blk["mlp"]["proj"])

    x = _ln(x, params["ln_f"])
    logits = wquant.matmul(x, params["head"])
    return logits, cache


def make_step_fn(params, cfg: GPTConfig, cond_len: int):
    """Decode-step adapter for :func:`wmar_tpu.engine.decode.decode_tokens`.

    ``step`` is the image-token index of the logits to produce; the freshly
    sampled token ``prev`` sits at absolute position ``cond_len + step - 1``.
    """

    def step_fn(cache: KVCache, prev: jnp.ndarray, step):
        pos = jnp.int32(cond_len) + step - 1
        logits, cache = gpt_forward(params, cfg, prev[:, None], cache, pos)
        return logits[:, -1], cache

    return step_fn


def prefill(params, cfg: GPTConfig, cond_tokens: jnp.ndarray, max_len: int, dtype=jnp.float32):
    """Run the conditioning prefix; returns first-step logits + cache."""
    b, c = cond_tokens.shape
    cache = KVCache.zeros(cfg.n_layer, b, cfg.n_head, max_len, cfg.head_dim, dtype)
    logits, cache = gpt_forward(params, cfg, cond_tokens, cache, 0)
    return logits[:, -1], cache


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))
