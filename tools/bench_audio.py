#!/usr/bin/env python
"""Audio generation throughput: Moshi-style LM frames/sec on one chip.

Measures the generation *mechanics* (temporal scan + depformer + per-stream
Maryland watermark hooks) at a ~1B-param config — NOT real-Moshi (7B)
throughput; see PERFORMANCE.md. Knobs: BENCH_AUDIO_BATCH (8),
BENCH_AUDIO_FRAMES (125), BENCH_AUDIO_CACHE (packed|int8|bf16|f32, default packed: 7217 f/s vs 5573 int8 measured).

Prints one JSON line {frames_per_sec, realtime_x (12.5 fps frames)}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

if not os.environ.get("WMAR_NO_JAX_CACHE"):
    from wmar_tpu.utils import tagged_cache_dir  # host-fingerprinted (cross-host AOT cache changes numerics)
    jax.config.update("jax_compilation_cache_dir", tagged_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from wmar_tpu.audio import MoshiConfig, MoshiGen, WMConfig, init_moshi_params

    batch = int(os.environ.get("BENCH_AUDIO_BATCH", "8"))
    frames = int(os.environ.get("BENCH_AUDIO_FRAMES", "125"))
    cache = {"int8": jnp.int8, "bf16": jnp.bfloat16, "f32": jnp.float32,
             "packed": "packed", "packed4": "packed4"}[
        os.environ.get("BENCH_AUDIO_CACHE", "packed")]
    tiny = jax.devices()[0].platform == "cpu"
    if tiny:
        cfg = MoshiConfig(text_vocab=64, audio_vocab=64, n_audio_streams=2,
                          dim=32, n_layers=2, n_heads=2, dep_dim=32,
                          dep_layers=1, dep_heads=2, delays=(0, 1))
    else:
        # the ~1B mechanics config from PERFORMANCE.md: 16L/1024d temporal,
        # 4L/512d depformer, 8 RVQ streams
        cfg = MoshiConfig(text_vocab=32000, audio_vocab=2048, n_audio_streams=8,
                          dim=1024, n_layers=16, n_heads=16, dep_dim=512,
                          dep_layers=4, dep_heads=8,
                          delays=(0, 1, 1, 1, 1, 1, 1, 1))
    params = init_moshi_params(jax.random.PRNGKey(0), cfg,
                               dtype=jnp.float32 if tiny else jnp.bfloat16)
    w8 = os.environ.get("BENCH_AUDIO_W8", "0") == "1"
    if w8:
        # weight-only int8 on the temporal backbone + text head (wquant)
        from wmar_tpu.audio.lm import quantize_moshi_params_int8

        params = quantize_moshi_params_int8(
            params, compute_dtype=None if tiny else jnp.bfloat16)
    wm = WMConfig(method="maryland", streams=tuple(range(9)), ngram=1,
                  delta=4.0, gamma=0.25, seed=0)
    gen = MoshiGen(params, cfg, wm, cache_dtype=cache)

    t0 = time.time()
    text, audio = gen.generate(frames, jax.random.PRNGKey(1), batch=batch)
    jax.block_until_ready(audio)
    compile_s = time.time() - t0

    iters = 3
    t0 = time.time()
    for i in range(iters):
        text, audio = gen.generate(frames, jax.random.PRNGKey(2 + i), batch=batch)
    jax.block_until_ready(audio)
    dt = time.time() - t0
    fps = batch * frames * iters / dt
    print(json.dumps({
        "metric": "moshi_style_1B_wm_frames_per_sec",
        "value": round(fps, 1),
        "realtime_x": round(fps / 12.5, 1),
        "cache": os.environ.get("BENCH_AUDIO_CACHE", "packed"),
        "weights": "int8" if w8 else "bf16",
        "batch": batch, "frames": frames, "compile_s": round(compile_s, 1),
        "tiny": tiny,
    }))


if __name__ == "__main__":
    main()
