#!/usr/bin/env python
"""Ablation decomposition of the RAR decode step on the real chip.

PERFORMANCE.md's breakdown attributes ~1.9 s (bf16) of the 2.78 s RAR-XL
batch to cache reads, ~0.3 s to weights, and calls the rest "step-fixed
overhead" without attribution. This tool measures the full 256-step scan
with individual pieces of the block disabled, so the residual can be pinned
to attention / MLP / adaLN / cache writes / sampling instead of guessed.

Each variant is the same `lax.scan` program shape as production
(`RARSampler.step_fn` + engine sampling), rebuilt with switches — the deltas
between variants are the per-piece costs.

Usage: python tools/bench_rar_ablate.py [--batch 64] [--size rar_xl]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

if not os.environ.get("WMAR_NO_JAX_CACHE"):
    from wmar_tpu.utils import tagged_cache_dir  # host-fingerprinted (cross-host AOT cache changes numerics)
    jax.config.update("jax_compilation_cache_dir", tagged_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from wmar_tpu.engine.attention import cached_decode_attention
from wmar_tpu.engine.kvcache import KVCache
from wmar_tpu.models.rar import (
    RARConfig,
    RARSampler,
    _embed_inputs,
    _linear,
    _ln,
    _modulate,
    init_rar_params,
    quantize_rar_params_int8,
    rar_config,
)


def ablated_block(blk, cfg, x, c, cache, layer, pos, *, attn, mlp, adaln, write):
    """`rar._block` with pieces switchable (tool-only copy for ablation)."""
    if adaln:
        mods = _linear(jax.nn.silu(c), blk["adaln"])
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = jnp.split(mods, 6, axis=-1)
    else:
        zero = jnp.zeros_like(x)
        sh_msa = sc_msa = sh_mlp = sc_mlp = zero
        g_msa = g_mlp = jnp.ones_like(x)

    if attn:
        h = _modulate(_ln(x, blk["norm1"]), sh_msa, sc_msa)
        b, t, d = h.shape
        qkv = _linear(h, blk["attn"]["qkv"]).reshape(b, t, 3, cfg.num_heads, cfg.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = _ln(q, blk["attn"]["q_norm"]).transpose(0, 2, 1, 3)
        k = _ln(k, blk["attn"]["k_norm"]).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        if write:
            cache = cache.write(layer, pos, k, v)
        a = cached_decode_attention(q, cache, layer, jnp.asarray(pos) + t)
        a = a.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + g_msa * _linear(a, blk["attn"]["proj"])

    if mlp:
        h2 = _modulate(_ln(x, blk["norm2"]), sh_mlp, sc_mlp)
        h2 = jax.nn.gelu(_linear(h2, blk["mlp"]["fc1"]), approximate=False)
        x = x + g_mlp * _linear(h2, blk["mlp"]["fc2"])
    return x, cache


def build_runner(cfg, batch, cache_dtype, steps, *, attn=True, mlp=True,
                 adaln=True, write=True, blocks=True, sample=True):
    # params flow in as jit ARGUMENTS — closure capture would bake ~1 GB of
    # weights into the serialized HLO as constants, which the tunneled
    # remote compiler rejects with HTTP 413 (armm.py has the same note).
    max_len = cfg.max_positions

    def step(params, sampler, cache, prev, step_idx):
        bb = sampler.cond_ids.shape[0]
        tokens = jnp.concatenate([prev, prev], axis=0)
        pos = step_idx + 1
        positions = jnp.broadcast_to(pos, (bb, 1)).astype(jnp.int32)
        x = _embed_inputs(params, cfg, tokens[:, None], positions)
        c = sampler._cond_stream(positions)  # noqa: SLF001
        if blocks:
            for li, blk in enumerate(params["blocks"]):
                x, cache = ablated_block(blk, cfg, x, c, cache, li, pos,
                                         attn=attn, mlp=mlp, adaln=adaln, write=write)
        shift, scale = jnp.split(_linear(jax.nn.silu(c[:, -1:]), params["final_adaln"]), 2, axis=-1)
        h = _modulate(_ln(x[:, -1:], {}), shift, scale)
        logits = _linear(h, params["lm_head"])
        return sampler._combine(logits[:, 0], step_idx), cache

    def run(params, rng):
        sampler = RARSampler(params, cfg, jnp.arange(batch) % cfg.num_classes,
                             guidance_scale=4.0, cache_dtype=cache_dtype)
        bb = sampler.cond_ids.shape[0]
        cache = KVCache.zeros(cfg.depth, bb, cfg.num_heads, max_len, cfg.head_dim, cache_dtype)
        # skip real prefill: decode-step cost is what we measure

        def body(carry, i):
            cache, prev = carry
            logits, cache = step(params, sampler, cache, prev, i)
            if sample:
                tok = jax.random.categorical(jax.random.fold_in(rng, i), logits)
            else:
                tok = jnp.argmax(logits, axis=-1)
            return (cache, tok.astype(jnp.int32)), tok.astype(jnp.int32)

        (_, _), toks = jax.lax.scan(
            body, (cache, jnp.zeros((batch,), jnp.int32)),
            jnp.arange(steps, dtype=jnp.int32))
        return toks

    return run


def bench(tag, fn, params, steps):
    f = jax.jit(fn)
    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    jax.block_until_ready(f(params, rng))
    comp = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(f(params, rng))
    dt = time.time() - t0
    print(f"  {tag:28s} {dt:7.3f} s/scan  {dt/steps*1e3:7.3f} ms/step  (compile {comp:.0f}s)",
          flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=str, default="rar_xl")
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--cache", type=str, default="packed4",
                    choices=["int8", "bf16", "f32", "packed", "packed4"])
    ap.add_argument("--w8", type=int, default=1)
    args = ap.parse_args()

    if args.size == "tiny":  # CPU smoke: trace/shape validation only
        cfg = RARConfig(embed_dim=64, depth=2, num_heads=2, intermediate_size=128,
                        image_seq_len=16, codebook_size=64, num_classes=10)
    else:
        cfg = rar_config(args.size)
    params = init_rar_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if args.w8:
        params = quantize_rar_params_int8(params, compute_dtype=jnp.bfloat16)
    cache_dtype = {"int8": jnp.int8, "bf16": jnp.bfloat16,
                   "f32": jnp.float32, "packed": "packed",
                   "packed4": "packed4"}[args.cache]
    print(f"platform={jax.devices()[0].platform} size={args.size} batch={args.batch} "
          f"cache={args.cache} w8={args.w8} steps={args.steps}", flush=True)

    mk = lambda **kw: build_runner(cfg, args.batch, cache_dtype, args.steps, **kw)
    full = bench("full", mk(), params, args.steps)
    for tag, kw in [
        ("no-sample (argmax)", dict(sample=False)),
        ("no-adaln", dict(adaln=False)),
        ("no-mlp", dict(mlp=False)),
        ("no-cache-write", dict(write=False)),
        ("no-attn (skip attn branch)", dict(attn=False)),
        ("no-blocks (embed+head only)", dict(blocks=False)),
    ]:
        dt = bench(tag, mk(**kw), params, args.steps)
        print(f"    -> delta vs full: {full-dt:+.3f} s", flush=True)


if __name__ == "__main__":
    main()
