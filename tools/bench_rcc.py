#!/usr/bin/env python
"""RCC finetune throughput at the reference Taming geometry.

The reference's golden run trains 10 epochs x 50k ImageNet codes in 6,055 s
on 16 GPUs (``logs/0620_taming_ft_stdout.txt``) = 82.6 imgs/s fleet-wide
= **5.16 imgs/s per GPU** at batch 4/device. This measures our jitted RCC
train step (decode -> aug branch -> re-encode -> L1+perceptual+idem, adam)
on one chip at the same per-device batch, full 256px f16 VQGAN geometry.

Usage: python tools/bench_rcc.py [--batch 4] [--iters 20] [--level all+geom]
Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
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

REF_IMGS_PER_SEC_PER_GPU = 50000 * 10 / 6055.0 / 16  # 5.16


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--level", type=str, default="strong",
                    help="aug curriculum level (warmup|weak|medium|strong)")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args(argv)

    from wmar_tpu.finetune import (
        RCCConfig,
        TamingRCCAdapter,
        init_state,
        make_optimizer,
        make_train_step,
    )
    from wmar_tpu.models import TAMING_IMAGENET_F16, TamingVQGAN, VQGANConfig

    if args.tiny:
        vq_cfg = VQGANConfig(resolution=32, ch=32, ch_mult=(1, 2),
                             num_res_blocks=1, attn_resolutions=(),
                             z_channels=32, n_embed=64, embed_dim=16)
    else:
        vq_cfg = TAMING_IMAGENET_F16
    model = TamingVQGAN(vq_cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, vq_cfg.resolution, vq_cfg.resolution, 3)))
    adapter = TamingRCCAdapter(model, variables)
    cfg = RCCConfig()
    opt = make_optimizer(cfg)
    state = init_state(adapter, opt)
    train_step = jax.jit(make_train_step(adapter, cfg, args.level, opt),
                         donate_argnums=0)

    codes = jnp.asarray(np.random.default_rng(0).integers(
        0, vq_cfg.n_embed, size=(args.batch, vq_cfg.codes_per_side ** 2)))

    t0 = time.time()
    state, metrics = train_step(state, codes, jax.random.PRNGKey(0))
    jax.block_until_ready(metrics["loss"])
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(args.iters):
        state, metrics = train_step(state, codes, jax.random.fold_in(
            jax.random.PRNGKey(1), i))
    jax.block_until_ready(metrics["loss"])
    dt = time.time() - t0
    imgs_per_sec = args.batch * args.iters / dt

    print(json.dumps({
        "metric": "rcc_taming_train_imgs_per_sec_per_chip"
        if not args.tiny else "rcc_tiny (TINY MODE)",
        "value": round(imgs_per_sec, 3),
        "unit": "imgs/s",
        "vs_baseline": round(imgs_per_sec / REF_IMGS_PER_SEC_PER_GPU, 3),
    }))
    print(f"# batch={args.batch} iters={args.iters} step_ms="
          f"{1000 * dt / args.iters:.1f} compile_s={compile_s:.1f} "
          f"loss={float(metrics['loss']):.4f} "
          f"platform={jax.devices()[0].platform}", flush=True)


if __name__ == "__main__":
    main()
