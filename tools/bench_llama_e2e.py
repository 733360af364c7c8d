#!/usr/bin/env python
"""End-to-end llama decode at the Chameleon long-context shape: XLA vs
Pallas flash-decode attention.

tools/bench_attention.py measures the isolated kernels (pallas 17% faster
at B=3/H=32/T=4096/D=128); this measures the whole decode step — qkv/ffn
matmuls, rope, cache write, vocab projection — as the production scan runs
it, which is what a default flip must be justified by (ROADMAP item 3).

Model: Chameleon-proportioned blocks (d=4096, H=32, D=128, FFN 11008) at a
reduced layer count / vocab so the tunneled remote compiler accepts it; the
attention:matmul ratio per layer matches the 7B. B=3 rows = instruct-CFG.

Usage: python tools/bench_llama_e2e.py [--layers 4] [--steps 128]
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

import wmar_tpu.models.llama as llama_mod
from wmar_tpu.engine.kvcache import KVCache
from wmar_tpu.models.llama import LlamaConfig, init_llama_params, llama_forward


def build(args):
    cfg = LlamaConfig(dim=args.dim, n_layers=args.layers, n_heads=args.heads,
                      vocab_size=args.vocab, qk_normalization=True)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    return cfg, params


def make_step(cfg, params, cache_dtype, steps, cache_len):
    b = 3

    # params are jit ARGUMENTS: closure capture bakes ~GBs of weights into
    # the serialized HLO as constants and the tunneled remote compiler
    # rejects the request with HTTP 413 (same fix as bench_rar_ablate.py).
    def run(params, tok0, cache, pos0):
        def body(carry, _):
            tok, cache, pos = carry
            positions = jnp.full((b, 1), pos, jnp.int32)
            logits, cache = llama_forward(
                params, cfg, tok, cache, pos, positions)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
            return (nxt, cache, pos + 1), nxt[:, 0]

        (_, cache, _), toks = jax.lax.scan(
            body, (tok0, cache, pos0), None, length=steps)
        return toks

    # prefill most of the window so decode reads a realistically full cache;
    # one on-device program — host-side RNG + per-layer tunnel transfers of
    # the [B, H, pre, D] blocks measured minutes/variant on this backend.
    pre = cache_len - steps - 1

    @jax.jit
    def make_cache(key):
        cache = KVCache.zeros(cfg.n_layers, b, cfg.n_heads, cache_len,
                              cfg.head_dim, dtype=cache_dtype)
        for li in range(cfg.n_layers):
            kv = jax.random.normal(
                jax.random.fold_in(key, li),
                (b, cfg.n_heads, pre, cfg.head_dim), jnp.float32) * 0.3
            cache = cache.write(li, 0, kv, kv[..., ::-1])
        return cache

    cache = jax.block_until_ready(make_cache(jax.random.PRNGKey(0)))
    tok0 = jnp.zeros((b, 1), jnp.int32)
    return run, (params, tok0, cache, jnp.int32(pre))


def bench(tag, cfg, params, cache_dtype, steps, cache_len, flash):
    llama_mod.USE_FLASH_DECODE = flash  # read at trace time
    print(f"  {tag}: building cache + compiling...", flush=True)
    run, arg = make_step(cfg, params, cache_dtype, steps, cache_len)
    fn = jax.jit(run)
    t0 = time.time()
    jax.block_until_ready(fn(*arg))
    compile_s = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(fn(*arg))
    dt = (time.time() - t0) / steps
    print(f"  {tag:22s} {dt*1e3:8.2f} ms/step   (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--vocab", type=int, default=8192)
    ap.add_argument("--cache_len", type=int, default=4096)
    ap.add_argument("--dim", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=32)
    args = ap.parse_args()

    print(f"platform: {jax.devices()[0].platform}  layers={args.layers} "
          f"cache={args.cache_len} steps={args.steps}", flush=True)
    cfg, params = build(args)
    for cache_dtype, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
        base = bench(f"xla-{name}", cfg, params, cache_dtype, args.steps,
                     args.cache_len, False)
        fl = bench(f"flash-{name}", cfg, params, cache_dtype, args.steps,
                   args.cache_len, True)
        print(f"  -> flash/{name}: {base/fl:.2f}x vs xla", flush=True)
    # packed cache: routes through the chunked packed kernel regardless of
    # the flash flag (llama._cache_attention dispatches on the cache type)
    bench("packed-chunked", cfg, params, "packed", args.steps,
          args.cache_len, False)


if __name__ == "__main__":
    main()
