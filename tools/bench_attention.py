#!/usr/bin/env python
"""Microbenchmark: decode-attention variants on the real chip.

Compares, at RAR-XL and Chameleon-4k decode shapes, per-step time of:
  xla-bf16    decode_attention over a bf16 cache
  xla-int8    decode_attention over QuantKVCache.layer() (fused dequant)
  pallas-bf16 flash_decode_attention
  pallas-int8 flash_decode_attention_q8 (int8 HBM reads, VMEM dequant)

Each timed as 64 chained steps inside one jitted scan so program overhead
amortizes (the production decode is a scan too).
"""

from __future__ import annotations

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

from wmar_tpu.engine.attention import decode_attention
from wmar_tpu.engine.kvcache import KVCache, PackedQuantKVCache
from wmar_tpu.ops.flash_decode import (
    flash_decode_attention,
    flash_decode_attention_q8,
    packed_decode_attention_q8,
)

STEPS = 64


def bench(name, fn, *args):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / STEPS
    print(f"  {name:12s} {dt*1e6:9.1f} us/step")
    return dt


def run_shape(tag, b, h, t, d):
    print(f"{tag}: B={b} H={h} T={t} D={d}")
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, 1, d)), jnp.bfloat16)
    kf = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    vf = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    cq = KVCache.zeros(1, b, h, t, d, dtype=jnp.int8)
    cq = cq.write(0, 0, kf.astype(jnp.float32), vf.astype(jnp.float32))
    ki, vi, ks, vs = cq.k[0], cq.v[0], cq.k_scale[0], cq.v_scale[0]
    n = jnp.int32(t)

    def loop(step_fn):
        def body(acc, i):
            o = step_fn(acc)
            return o.astype(q.dtype), ()
        def run(q0):
            out, _ = jax.lax.scan(body, q0, jnp.arange(STEPS))
            return out
        return run

    bench("xla-bf16", loop(lambda qq: decode_attention(qq, kf, vf, n)), q)
    bench("xla-int8", loop(lambda qq: decode_attention(
        qq, ki.astype(jnp.bfloat16) * ks[..., None],
        vi.astype(jnp.bfloat16) * vs[..., None], n)), q)
    try:
        bench("pallas-bf16", loop(lambda qq: flash_decode_attention(qq, kf, vf, n)), q)
    except Exception as e:  # noqa: BLE001
        print(f"  pallas-bf16  FAILED: {type(e).__name__}: {str(e)[:120]}")
    try:
        bench("pallas-int8", loop(
            lambda qq: flash_decode_attention_q8(qq, ki, vi, ks, vs, n)), q)
    except Exception as e:  # noqa: BLE001
        print(f"  pallas-int8  FAILED: {type(e).__name__}: {str(e)[:120]}")
    cp = PackedQuantKVCache.zeros(1, b, h, t, d)
    cp = cp.write(0, 0, kf.astype(jnp.float32), vf.astype(jnp.float32))
    try:
        from wmar_tpu.ops.flash_decode import _packed_dma_probe

        bench("packed-dma", loop(
            lambda qq: _packed_dma_probe(qq, cp.kv, cp.scale, 0,
                                         rows_per_block=1 if b % 4 else 4)), q)
    except Exception as e:  # noqa: BLE001
        print(f"  packed-dma  FAILED: {type(e).__name__}: {str(e)[:120]}")
    # chunked dynamic-length path: full-length worst case + mid-generation
    for tag, n_valid in (("full", t), ("half", t // 2)):
        try:
            bench(f"packed-chunk128-{tag}", loop(
                lambda qq, nv=jnp.int32(n_valid): packed_decode_attention_q8(
                    qq, cp.kv, cp.scale, 0, nv, chunk_t=128)), q)
        except Exception as e:  # noqa: BLE001
            print(f"  packed-chunk128-{tag}  FAILED: {type(e).__name__}: {str(e)[:120]}")
    if t >= 1024:  # masked variant (Chameleon fused CFG rows + ragged starts)
        km = jnp.asarray(rng.integers(0, 2, (b, t)).astype(np.float32) > 0)
        st = jnp.asarray(rng.integers(0, 8, (b,)), jnp.int32)
        try:
            bench("packed-chunk-masked", loop(
                lambda qq: packed_decode_attention_q8(
                    qq, cp.kv, cp.scale, 0, jnp.int32(t), start=st,
                    key_mask=km, chunk_t=128)), q)
        except Exception as e:  # noqa: BLE001
            print(f"  packed-chunk-masked  FAILED: {type(e).__name__}: {str(e)[:120]}")
    for rb in (8, 4, 2):
        if b % rb:
            continue
        try:
            bench(f"packed-rb{rb}", loop(
                lambda qq: packed_decode_attention_q8(
                    qq, cp.kv, cp.scale, 0, n, rows_per_block=rb)), q)
        except Exception as e:  # noqa: BLE001
            print(f"  packed-rb{rb}  FAILED: {type(e).__name__}: {str(e)[:120]}")
    from wmar_tpu.engine.kvcache import Packed4QuantKVCache
    from wmar_tpu.ops.flash_decode import packed4_decode_attention

    c4 = Packed4QuantKVCache.zeros(1, b, h, t, d)
    c4 = c4.write(0, 0, kf.astype(jnp.float32), vf.astype(jnp.float32))
    for rb in (8, 4, 2):
        if b % rb:
            continue
        try:
            bench(f"packed4-rb{rb}", loop(
                lambda qq: packed4_decode_attention(
                    qq, c4.kv, c4.scale, 0, n, rows_per_block=rb,
                    chunk_t=0)), q)
        except Exception as e:  # noqa: BLE001
            print(f"  packed4-rb{rb}  FAILED: {type(e).__name__}: {str(e)[:120]}")


def main():
    print(f"platform: {jax.devices()[0].platform}")
    run_shape("RAR-XL decode (2B CFG rows)", 128, 16, 258, 64)
    run_shape("Chameleon 4k decode (3 CFG rows)", 3, 32, 4096, 128)


if __name__ == "__main__":
    main()
