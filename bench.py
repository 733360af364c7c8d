#!/usr/bin/env python
"""Headline benchmark: watermarked 256px RAR-XL samples/sec on one chip.

Generates class-conditional ImageNet-256 images with the full pipeline —
fused greenlist watermark in a 256-step `lax.scan` decode with in-batch CFG
(2B rows), then MaskGit-VQGAN decode to pixels — and reports images/sec.

Baseline: the driver's target of >= 5000 watermarked 256px samples/hour/chip
on RAR-XL (1.389 imgs/s); the reference generates RAR batches of 10 on one
A100-class GPU per chunk (``configs/rar_generate.json``).

Weights are random (the published checkpoints are not fetchable in this
environment); throughput is architecture+shape bound, not weight bound.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
Env knobs: BENCH_BATCH (default 64), BENCH_ITERS (default 3), BENCH_TINY=1.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: remote-compile TPU backends take minutes on the
# first big program; cache hits bring reruns down to seconds.
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_IMGS_PER_SEC = 5000.0 / 3600.0


def _bind_backend(timeout_s: float = 600.0):
    """jax.devices() with a watchdog: the tunneled backend can go
    unresponsive (observed mid-round-3: even device binding hangs forever),
    and a hung bench is worse than a loud rc!=0."""
    import sys
    import threading

    out = []
    t = threading.Thread(target=lambda: out.append(jax.devices()), daemon=True)
    t.start()
    t.join(timeout_s)
    if not out:
        sys.exit(f"bench: backend did not bind within {timeout_s:.0f}s "
                 "(tunneled TPU unresponsive)")
    return out[0]


def main():
    from wmar_tpu.core import WatermarkSpec
    from wmar_tpu.core.spec import SeedStrategy, SplitStrategy
    from wmar_tpu.models import (
        GenParams,
        MASKGIT_IMAGENET_F16,
        MaskGitVQConfig,
        MaskGitVQGAN,
        RarARMM,
        init_rar_params,
        rar_config,
    )

    tiny = os.environ.get("BENCH_TINY", "0") == "1" or _bind_backend()[0].platform == "cpu"
    batch = int(os.environ.get("BENCH_BATCH", "4" if tiny else "64"))
    iters = int(os.environ.get("BENCH_ITERS", "1" if tiny else "3"))

    if tiny:
        from wmar_tpu.models import RARConfig

        rar_cfg = RARConfig(embed_dim=64, depth=2, num_heads=2, intermediate_size=128,
                            image_seq_len=16, codebook_size=64, num_classes=10)
        vq_cfg = MaskGitVQConfig(resolution=8, hidden_channels=32, channel_mult=(1, 2),
                                 num_res_blocks=1, z_channels=16, n_embed=64, embed_dim=16)
    else:
        rar_cfg = rar_config(os.environ.get("BENCH_SIZE", "rar_xl"))
        vq_cfg = MASKGIT_IMAGENET_F16

    dtype = jnp.bfloat16
    rar_params = init_rar_params(jax.random.PRNGKey(0), rar_cfg, dtype=dtype)
    if os.environ.get("BENCH_W8", "1") == "1":
        # weight-only int8 by default (BENCH_W8=0 for bf16 weights): halves
        # the ~0.9 GB/step weight HBM reads while keeping the activation
        # stream bf16 (embeddings seed compute dtype). Measured +1.8%
        # (24.5 -> 25.0 imgs/s) on the tunneled v5e; greedy agreement with
        # float weights is tested per family.
        from wmar_tpu.models.rar import quantize_rar_params_int8

        rar_params = quantize_rar_params_int8(rar_params, compute_dtype=dtype)
    vq = MaskGitVQGAN(vq_cfg)
    vq_params = vq.init(jax.random.PRNGKey(1), jnp.zeros((1, vq_cfg.resolution, vq_cfg.resolution, 3)))
    vq_params = jax.tree.map(lambda x: x.astype(dtype), vq_params)

    # Packed int8 KV cache by default: same per-(token, head) quantization
    # as int8 (bit-identical cache values, ~0.4% noise), stored [T, H*D] and
    # read by the batch-blocked Pallas decode kernel — measured 26.5 imgs/s
    # vs 25.0 for the XLA int8 path and 22.4 bf16 on the tunneled v5e
    # (BENCH_CACHE={int8,bf16,f32,int4} to compare).
    cache_env = os.environ.get("BENCH_CACHE", "packed")
    cache_dtype = {"int8": jnp.int8, "bf16": jnp.bfloat16, "f32": jnp.float32,
                   "int4": "int4", "packed": "packed",
                   "packed4": "packed4"}[cache_env]
    wrapper = RarARMM(rar_params, rar_cfg, vq_params, vq_cfg, cache_dtype=cache_dtype)
    spec = WatermarkSpec(
        vocab_size=rar_cfg.codebook_size,
        seed_strategy=SeedStrategy.LINEAR,
        split_strategy=SplitStrategy.RANDOM,
        context_size=1,
        delta=2.0,
        gamma=0.25,
    )
    wrapper.set_watermarker(spec)
    # Reference RAR sampling: plain multinomial after CFG (rar.py:452-455),
    # constant guidance 4.0 (rar_wrapper.py:92-101).
    gen = GenParams(temperature=1.0, top_k=None, top_p=None,
                    guidance_scale=4.0, guidance_scale_pow=0.0)

    classes = np.arange(batch) % rar_cfg.num_classes

    def one_batch(rng):
        codes = wrapper.sample(classes, gen, apply_watermark=True, rng=rng)
        imgs = wrapper.codes_to_images(codes)
        return codes, imgs

    # Warmup / compile
    t0 = time.time()
    codes, imgs = one_batch(jax.random.PRNGKey(100))
    jax.block_until_ready(imgs)
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(iters):
        codes, imgs = one_batch(jax.random.PRNGKey(i))
    jax.block_until_ready(imgs)
    dt = time.time() - t0

    imgs_per_sec = batch * iters / dt
    size = os.environ.get("BENCH_SIZE", "rar_xl")
    result = {
        "metric": f"watermarked_{size}_256px_imgs_per_sec_per_chip" if not tiny
        else "watermarked_rar_tiny_imgs_per_sec (TINY MODE)",
        "value": round(imgs_per_sec, 3),
        "unit": "imgs/s",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }
    print(json.dumps(result))
    if os.environ.get("BENCH_VERBOSE"):
        print(f"# batch={batch} iters={iters} gen_s={dt:.2f} compile_s={compile_s:.1f} "
              f"platform={jax.devices()[0].platform}")
    return result


if __name__ == "__main__":
    main()
