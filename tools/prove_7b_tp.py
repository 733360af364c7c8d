#!/usr/bin/env python
"""Prove the FULL Chameleon/Anole-7B geometry under 8-way tensor parallelism.

VERDICT r1 flagged "Anole-7B capable" as extrapolation: TP sharding was only
exercised at toy dims. This script jits the real `CHAMELEON_7B` config
(32 layers, dim 4096, 32 heads, 65k vocab — the exact geometry
`deps/chameleon/inference/transformer.py` shards over NCCL ranks) with
megatron specs over an 8-device mesh, runs a 16-token prefill plus decode
steps through a 4096-slot KV cache, and prints timings. On this image the
mesh is 8 virtual CPU devices (`xla_force_host_platform_device_count`); on a
TPU slice the same program runs over ICI unchanged.

Run:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/prove_7b_tp.py [--layers 32] [--steps 2]

Memory: 7B f32 params = 28 GB host RAM (one shared CPU space); pass
--dtype bf16 on real TPU hardware.
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--cache_len", type=int, default=4096)
    p.add_argument("--tp", type=int, default=8)
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel ring prefill over an sp mesh axis "
                        "(parallel/ring.py); proves the dp*tp*sp composition "
                        "at the full 7B geometry")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel prefill over a pp mesh axis "
                        "(parallel/pipeline.py GPipe schedule); layers must "
                        "divide by pp. Mutually exclusive with --sp")
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    p.add_argument("--weights", default=None, choices=["int8"],
                   help="weight-only int8 (ops/wquant): proves the quantized "
                        "7B tree — ~7 GB of weights, the single-v5e serving "
                        "config — compiles and runs (TP or tp=1)")
    args = p.parse_args()

    from wmar_tpu.engine.kvcache import KVCache
    from wmar_tpu.models.llama import (
        CHAMELEON_7B,
        init_llama_params,
        llama_forward,
        llama_prefill_sp,
        llama_tp_specs,
    )
    from wmar_tpu.parallel import apply_specs, llama_prefill_pp, make_mesh

    import dataclasses

    cfg = dataclasses.replace(CHAMELEON_7B, n_layers=args.layers)
    dtype = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    n_dev = len(jax.devices())
    assert n_dev >= args.tp, f"need {args.tp} devices, have {n_dev}"
    assert not (args.sp > 1 and args.pp > 1), "--sp and --pp are exclusive here"
    mesh = make_mesh(dp=n_dev // (args.tp * args.sp * args.pp), tp=args.tp,
                     sp=args.sp, pp=args.pp)
    print(f"devices: {n_dev} ({jax.devices()[0].platform}), mesh {mesh}")
    print(f"config: {cfg.n_layers}L dim={cfg.dim} heads={cfg.n_heads} "
          f"vocab={cfg.vocab_size} ({args.dtype})")

    t0 = time.time()
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    jax.block_until_ready(params)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"init: {n_params/1e9:.2f}B params in {time.time()-t0:.1f}s")

    if args.weights == "int8":
        from wmar_tpu.models.llama import quantize_llama_params_int8

        t0 = time.time()
        params = quantize_llama_params_int8(params, compute_dtype=dtype)
        jax.block_until_ready(params)
        nbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
        print(f"weight-only int8: {nbytes/1e9:.2f} GB total param bytes "
              f"in {time.time()-t0:.1f}s")

    with jax.set_mesh(mesh):
        t0 = time.time()
        params = apply_specs(mesh, params, llama_tp_specs(params))
        jax.block_until_ready(params)
        print(f"TP shard over {args.tp} devices: {time.time()-t0:.1f}s")

        tokens = jnp.arange(16, dtype=jnp.int32)[None, :] + 4
        cache = KVCache.zeros(cfg.n_layers, 1, cfg.n_heads, args.cache_len,
                              cfg.head_dim, dtype)
        pos = jnp.arange(16)[None, :]

        t0 = time.time()
        if args.pp > 1:
            fwd = jax.jit(lambda p, t, c: llama_prefill_pp(
                p, cfg, t, c, pos, mesh, microbatches=1))
            label = f"pipeline prefill (pp={args.pp})"
        elif args.sp > 1:
            fwd = jax.jit(lambda p, t, c: llama_prefill_sp(
                p, cfg, t, c, pos, mesh, tp_axis="tp", dp_axis="dp"))
            label = f"ring prefill (sp={args.sp})"
        else:
            fwd = jax.jit(lambda p, t, c: llama_forward(p, cfg, t, c, 0, pos))
            label = "prefill"
        logits, cache = fwd(params, tokens, cache)
        jax.block_until_ready(logits)
        print(f"{label}(16) compile+run: {time.time()-t0:.1f}s, "
              f"logits {logits.shape}")

        step = jax.jit(
            lambda p, tok, c, wp: llama_forward(p, cfg, tok, c, wp, wp[None, None])
        )
        prev = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
        t0 = time.time()
        for i in range(args.steps):
            logits, cache = step(params, prev, cache, jnp.int32(16 + i))
            prev = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
        jax.block_until_ready(logits)
        dt = time.time() - t0
        print(f"decode x{args.steps} (incl. 1 compile): {dt:.1f}s")
        print(f"OK: full {cfg.n_layers}-layer 7B-geometry TP={args.tp} "
              f"SP={args.sp} PP={args.pp} program compiled and executed")


if __name__ == "__main__":
    main()
