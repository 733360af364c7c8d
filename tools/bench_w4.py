#!/usr/bin/env python
"""Microbenchmark: weight-only int4 matmul routes on the real chip.

Decode at small batch is weight-read bound (PERFORMANCE.md: Chameleon-7B
~480 GB/s effective on the 7 GB int8 stream; Taming-1.4B +30% from int8
weights). int4 halves the weight bytes again, but the XLA grouped-uint8
route (`wquant.matmul4`) measured 3x SLOWER end to end — this tool
decomposes why and evaluates candidate routes at the Llama decode shapes:

  bf16          x @ w                                (2 bytes/param read)
  int8          (x @ q) * s, fused upcast            (1 byte/param)
  u8-grouped    current matmul4: unpack+stack+batched dot (materializes?)
  s4-perchan    (x @ w4.astype(bf16)) * s, native jnp.int4 operand
  s4-grouped    batched dot over groups with the s4 operand
  pallas-w4     VMEM dequant kernel (if implemented)

Each variant runs L layers inside one jitted scan (distinct weights per
layer so HBM reads are real, not cached); per-layer time printed. Params
are jit ARGS (tunnel HTTP 413 rule).
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

from wmar_tpu.ops import wquant

L = int(os.environ.get("W4_LAYERS", "8"))
# Inner repeats of the L-layer scan inside ONE jitted call: the tunneled
# backend has a ~65 ms/call round-trip floor that swamps per-layer time at
# R=1 (round-4 measurement: every variant read ~8 ms/layer == floor/L).
R = int(os.environ.get("W4_REPEAT", "64"))
GROUP = 128


def bench(name, fn, xs, wts):
    """Times fn(x, wts) with a DIFFERENT x per call (the tunneled backend
    appears to memoize byte-identical calls — same-args repeat timing reads
    absurdly fast); reports the min of 3 varied-input calls."""
    try:
        f = jax.jit(fn)
        out = f(xs[0], wts)
        jax.block_until_ready(out)
        _ = float(out[0, 0])  # force a sync the tunnel cannot elide
        times = []
        for x in xs[1:]:
            t0 = time.time()
            out = f(x, wts)
            jax.block_until_ready(out)
            _ = float(out[0, 0])
            times.append(time.time() - t0)
        dt = min(times) / (L * R)
        samples = "/".join(f"{t*1e3:.1f}" for t in times)
        print(f"  {name:12s} {dt*1e6:9.1f} us/layer  (calls {samples} ms)",
              flush=True)
        return dt
    except Exception as e:  # noqa: BLE001 - probe tool, report and continue
        print(f"  {name:12s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return None


def run_shape(m, k, n):
    print(f"shape: M={m} K={k} N={n}  (bf16 {L*k*n*2/1e9:.2f} GB total)",
          flush=True)
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
          for _ in range(4)]
    w = jnp.asarray(rng.standard_normal((L, k, n)) * 0.02, jnp.bfloat16)

    # int8 per-output-channel
    s8 = jnp.abs(w.astype(jnp.float32)).max(axis=1) / 127.0          # [L, n]
    q8 = jnp.clip(jnp.round(w.astype(jnp.float32) / s8[:, None, :]),
                  -127, 127).astype(jnp.int8)

    # grouped int4 (both uint8-packed and native s4 layouts)
    gc = k // GROUP
    wg = w.astype(jnp.float32).reshape(L, gc, GROUP, n)
    s4g = jnp.abs(wg).max(axis=2) / 7.0                               # [L, gc, n]
    q4 = jnp.clip(jnp.round(wg / s4g[:, :, None, :]), -7, 7)          # [L, gc, G, n]
    u = (q4.astype(jnp.int32) + 8)
    packed = (u[:, :, :GROUP // 2, :]
              | (u[:, :, GROUP // 2:, :] << 4)).astype(jnp.uint8)  # halves layout
    # native s4 arrays: the tunneled backend dies with a RecursionError on
    # device_put of S4 tiled layouts — guard so the other routes still run
    try:
        q4s4 = jax.block_until_ready(q4.astype(jnp.int4).reshape(L, k, n))
        s4c = jnp.abs(w.astype(jnp.float32)).max(axis=1) / 7.0
        q4c = jax.block_until_ready(
            jnp.clip(jnp.round(w.astype(jnp.float32) / s4c[:, None, :]),
                     -7, 7).astype(jnp.int4))
    except Exception as e:  # noqa: BLE001
        print(f"  s4 setup FAILED: {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        q4s4 = None

    def scan_over(fn):
        def run(x, wts):
            def layers(acc):
                def body(a, wl):
                    return a + fn(x, *wl).astype(jnp.float32), None
                a, _ = jax.lax.scan(body, acc, wts)
                return a
            # fori over the scan: acc feeds back so XLA cannot hoist/CSE
            # the repeats; every iteration re-reads the weights from HBM.
            return jax.lax.fori_loop(
                0, R, lambda i, a: layers(a) * 0.5,
                jnp.zeros((m, n), jnp.float32))
        return run

    bench("bf16", scan_over(lambda x, w: x @ w), xs, (w,))
    bench("int8", scan_over(lambda x, q, s: (x @ q.astype(x.dtype))
                            * s.astype(x.dtype)), xs, (q8, s8))
    bench("u8-grouped", scan_over(
        lambda x, p, s: wquant.matmul4_xla(x, {"q4": p, "s4": s.astype(jnp.bfloat16)})),
        xs, (packed, s4g))
    if q4s4 is not None:
        bench("s4-perchan", scan_over(lambda x, q, s: (x @ q.astype(x.dtype))
                                      * s.astype(x.dtype)), xs, (q4c, s4c))

        def s4_grouped(x, q, s):
            # q: [k, n] s4; scale partial sums per group like matmul4
            qg = q.reshape(gc, GROUP, n)
            xg = x.reshape(m, gc, GROUP).transpose(1, 0, 2)
            yg = jax.lax.dot_general(xg, qg.astype(x.dtype),
                                     (((2,), (1,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
            return (yg * s.astype(jnp.float32)[:, None, :]).sum(axis=0)

        bench("s4-grouped", scan_over(s4_grouped), xs, (q4s4, s4g))

    try:
        from wmar_tpu.ops.w4_matmul import matmul_w4_pallas

        bench("pallas-w4", scan_over(
            lambda x, p, s: matmul_w4_pallas(x, p, s.astype(jnp.bfloat16))),
            xs, (packed, s4g))
    except ImportError:
        pass


def main():
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          flush=True)
    # Llama-7B decode shapes at batch 4 x 3 CFG rows
    run_shape(12, 4096, 4096)
    run_shape(12, 4096, 11008)
    # Taming-1.4B decode at batch 32
    run_shape(32, 1664, 6656)


if __name__ == "__main__":
    main()
