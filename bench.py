#!/usr/bin/env python
"""Headline benchmark: watermarked imgs/sec on one chip, per model family.

BENCH_MODEL selects the family (all three of BASELINE.json's "watermarked
imgs/sec/chip (Taming/RAR/Anole)" targets):

- ``rar`` (default): RAR-XL 256px class-conditional — fused greenlist
  watermark in a 256-step `lax.scan` decode with in-batch CFG (2B rows),
  then MaskGit-VQGAN decode to pixels.
- ``taming``: Taming cin_transformer at the published 1.4B geometry
  (48L/1664d/16H, vocab 16384, ``reference deps/taming`` net2net GPT) —
  class token prefill + 256-step watermarked decode + f16 VQGAN decode.
- ``chameleon``: Chameleon-7B (CHAMELEON_7B llama geometry, 65536 vocab,
  int8 weights + packed int8 KV cache) — instruct-CFG t2i, 1024-token
  image segment at 512px, watermarked decode + VQGAN decode.

Baseline: the driver's target of >= 5000 watermarked 256px samples/hour/chip
(1.389 imgs/s); the reference generates batches of 5-10 on one A100-class
GPU per chunk (``configs/{taming,rar,chameleon}_generate.json``).

Weights are random (the published checkpoints are not fetchable in this
environment); throughput is architecture+shape bound, not weight bound.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
Env knobs: BENCH_MODEL (rar|taming|chameleon), BENCH_BATCH, BENCH_ITERS,
BENCH_TINY=1, BENCH_CACHE (packed4|packed|int8|bf16|f32),
BENCH_W (int8|int4|bf16 weight-only quantization; BENCH_W8=0 -> bf16).
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
from wmar_tpu.utils import tagged_cache_dir  # host-fingerprinted (cross-host AOT cache changes numerics)
jax.config.update("jax_compilation_cache_dir", tagged_cache_dir())
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


def _cache_dtype():
    # Packed int4 KV cache by default (K+V nibbles share a byte, read by the
    # batch-blocked Pallas decode kernel): 30.8 imgs/s vs 28.8 packed-int8 /
    # 25.0 XLA-int8 / 22.4 bf16 on the tunneled v5e. Watermark strength and
    # detection TPR measured equivalent to int8/bf16 (PERFORMANCE.md,
    # tools/compare_cache_quality.py --tpr); BENCH_CACHE=packed reverts.
    cache_env = os.environ.get("BENCH_CACHE", "packed4")
    return {"int8": jnp.int8, "bf16": jnp.bfloat16, "f32": jnp.float32,
            "packed": "packed", "packed4": "packed4"}[cache_env]


def _weight_bits():
    """Weight-only quantization knob: BENCH_W=int8 (default) | int4 | bf16.

    BENCH_W8=0 keeps its historical meaning (bf16 weights). Returns the bit
    width or None for float weights.
    """
    if os.environ.get("BENCH_W8", "1") == "0":
        return None
    w = os.environ.get("BENCH_W", "int8")
    return {"int8": 8, "int4": 4, "bf16": None}[w]


def _watermark_spec(vocab_size):
    from wmar_tpu.core import WatermarkSpec
    from wmar_tpu.core.spec import SeedStrategy, SplitStrategy

    return WatermarkSpec(
        vocab_size=vocab_size,
        seed_strategy=SeedStrategy.LINEAR,
        split_strategy=SplitStrategy.RANDOM,
        context_size=1,
        delta=2.0,
        gamma=0.25,
    )


def build_rar(tiny):
    from wmar_tpu.models import (
        GenParams,
        MASKGIT_IMAGENET_F16,
        MaskGitVQConfig,
        MaskGitVQGAN,
        RarARMM,
        init_rar_params,
        rar_config,
    )

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
    if _weight_bits():
        # weight-only int8 by default (BENCH_W=bf16 for float weights):
        # halves the ~0.9 GB/step weight HBM reads while keeping the
        # activation stream bf16 (embeddings seed compute dtype). Measured
        # +1.8% (24.5 -> 25.0 imgs/s) on the tunneled v5e; greedy agreement
        # with float weights is tested per family. BENCH_W=int4 halves the
        # weight bytes again; with the group-halves layout it measures 25.9
        # imgs/s on RAR-XL (vs 30.8 int8 — this family is cache-read bound,
        # so the extra VPU unpack is not repaid). int4 is the footprint
        # option (and the lever for weight-bound families like Chameleon).
        from wmar_tpu.models.rar import quantize_rar_params_int8

        rar_params = quantize_rar_params_int8(rar_params, compute_dtype=dtype,
                                              bits=_weight_bits())
    vq = MaskGitVQGAN(vq_cfg)
    vq_params = vq.init(jax.random.PRNGKey(1), jnp.zeros((1, vq_cfg.resolution, vq_cfg.resolution, 3)))
    vq_params = jax.tree.map(lambda x: x.astype(dtype), vq_params)

    wrapper = RarARMM(rar_params, rar_cfg, vq_params, vq_cfg, cache_dtype=_cache_dtype())
    wrapper.set_watermarker(_watermark_spec(wrapper.get_total_vocab_size()))
    # Reference RAR sampling: plain multinomial after CFG (rar.py:452-455),
    # constant guidance 4.0 (rar_wrapper.py:92-101).
    gen = GenParams(temperature=1.0, top_k=None, top_p=None,
                    guidance_scale=4.0, guidance_scale_pow=0.0)
    size = os.environ.get("BENCH_SIZE", "rar_xl")

    def one_batch(batch, rng):
        classes = np.arange(batch) % rar_cfg.num_classes
        codes = wrapper.sample(classes, gen, apply_watermark=True, rng=rng)
        return wrapper.codes_to_images(codes)

    return one_batch, f"watermarked_{size}_256px", 64


def build_taming(tiny):
    from wmar_tpu.models import (
        GenParams,
        GPTConfig,
        TAMING_IMAGENET_F16,
        TamingARMM,
        TamingVQGAN,
        VQGANConfig,
        init_gpt_params,
    )

    if tiny:
        gpt_cfg = GPTConfig(vocab_size=64, block_size=300, n_layer=2, n_head=2, n_embd=32)
        vq_cfg = VQGANConfig(resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                             attn_resolutions=(16,), z_channels=32, n_embed=64, embed_dim=16)
    else:
        # published cin_transformer geometry (1.4B params; generate.py has
        # the same literal) — the BASELINE "Taming" family
        gpt_cfg = GPTConfig(vocab_size=16384, block_size=512, n_layer=48,
                            n_head=16, n_embd=1664)
        vq_cfg = TAMING_IMAGENET_F16

    dtype = jnp.bfloat16
    gpt_params = init_gpt_params(jax.random.PRNGKey(0), gpt_cfg, dtype=dtype)
    if not tiny and _weight_bits():
        # same weight-only int8 default as the rar/chameleon builders; at
        # batch 32 the 1.4B decode is weight-read bound (2.8 GB/step bf16)
        from wmar_tpu.models.taming_gpt import quantize_gpt_params_int8

        gpt_params = quantize_gpt_params_int8(gpt_params, compute_dtype=dtype,
                                              bits=_weight_bits())
    vq = TamingVQGAN(vq_cfg)
    vq_params = vq.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, vq_cfg.resolution, vq_cfg.resolution, 3)))
    vq_params = jax.tree.map(lambda x: x.astype(dtype), vq_params)

    wrapper = TamingARMM(gpt_params, gpt_cfg, vq_params, vq_cfg,
                         cache_dtype=_cache_dtype())
    wrapper.set_watermarker(_watermark_spec(wrapper.get_total_vocab_size()))
    # configs/taming_generate.json sampling params (reference grid)
    gen = GenParams(temperature=1.0, top_k=250, top_p=0.92)

    def one_batch(batch, rng):
        classes = np.arange(batch) % 1000
        codes = wrapper.sample(classes, gen, apply_watermark=True, rng=rng)
        return wrapper.codes_to_images(codes)

    return one_batch, "watermarked_taming1.4b_256px", 32


def build_chameleon(tiny):
    from wmar_tpu.models import (
        CHAMELEON_F16,
        CHAMELEON_7B,
        ChameleonARMM,
        ChameleonVocab,
        GenParams,
        LlamaConfig,
        TamingVQGAN,
        VQGANConfig,
    )
    from wmar_tpu.models.llama import init_llama_params, quantize_llama_params_int8

    if tiny:
        vocab = ChameleonVocab.synthetic(n_codes=16, n_text=20)
        lcfg = LlamaConfig(dim=32, n_layers=2, n_heads=4,
                           vocab_size=vocab.vocab_size, multiple_of=16,
                           qk_normalization=True)
        vq_cfg = VQGANConfig(resolution=8, ch=32, ch_mult=(1, 2),
                             num_res_blocks=1, attn_resolutions=(),
                             z_channels=32, n_embed=16, embed_dim=8)
        image_seq_len = 16
    else:
        # CHAMELEON_7B geometry with a synthetic full-size vocab (8192 image
        # codes + text fill to the 65536-entry table; random weights — see
        # module docstring). int8 weights + packed KV: the serving config
        # proven equivalent in tools/compare_cache_quality.py.
        lcfg = CHAMELEON_7B
        vq_cfg = CHAMELEON_F16
        vocab = ChameleonVocab.synthetic(
            n_codes=8192, n_text=lcfg.vocab_size - 8192 - 6)
        image_seq_len = 1024

    dtype = jnp.bfloat16
    params = init_llama_params(jax.random.PRNGKey(0), lcfg, dtype=dtype)
    if not tiny and _weight_bits():
        # donate: 7B bf16 (~14 GB) + int8 copy would exceed one v5e's HBM
        params = quantize_llama_params_int8(params, compute_dtype=dtype,
                                            donate=True, bits=_weight_bits())
    vq = TamingVQGAN(vq_cfg)
    vq_params = vq.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, vq_cfg.resolution, vq_cfg.resolution, 3)))
    vq_params = jax.tree.map(lambda x: x.astype(dtype), vq_params)

    tok = lambda text: [6 + (ord(c) % 20) for c in text[:16]]  # noqa: E731
    wrapper = ChameleonARMM(
        params, lcfg, vocab, vq_params, vq_cfg, tokenizer=tok,
        image_seq_len=image_seq_len,
        cache_dtype=jnp.float32 if tiny else _cache_dtype(),
    )
    wrapper.set_watermarker(_watermark_spec(wrapper.get_total_vocab_size()))
    # configs/chameleon_generate.json sampling params; instruct-CFG scales
    # (3.0 text / 1.2 image) are the wrapper's cfg_opts defaults.
    gen = GenParams(temperature=0.9, top_k=None, top_p=0.9)
    prompts = [f"a photo of object {i}" for i in range(1024)]

    def one_batch(batch, rng):
        codes = wrapper.sample(prompts[:batch], gen, apply_watermark=True, rng=rng)
        return wrapper.codes_to_images(codes)

    # batch 8 fits in one v5e's 16 GB with the packed4 default (the halved
    # cache is what made room: batch 8 + packed-int8 OOMs by 3.45 GB) and
    # nearly doubles throughput by amortizing the 7 GB weight read. With
    # BENCH_CACHE=packed/int8/bf16 use BENCH_BATCH=4.
    return one_batch, "watermarked_chameleon7b_512px", 8


BUILDERS = {"rar": build_rar, "taming": build_taming, "chameleon": build_chameleon}


def main():
    model = os.environ.get("BENCH_MODEL", "rar")
    tiny = os.environ.get("BENCH_TINY", "0") == "1" or _bind_backend()[0].platform == "cpu"
    one_batch, metric, default_batch = BUILDERS[model](tiny)
    batch = int(os.environ.get("BENCH_BATCH", "4" if tiny else str(default_batch)))
    iters = int(os.environ.get("BENCH_ITERS", "1" if tiny else "3"))

    # Warmup / compile
    t0 = time.time()
    imgs = one_batch(batch, jax.random.PRNGKey(100))
    jax.block_until_ready(imgs)
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(iters):
        imgs = one_batch(batch, jax.random.PRNGKey(i))
    jax.block_until_ready(imgs)
    dt = time.time() - t0

    imgs_per_sec = batch * iters / dt
    result = {
        "metric": f"{metric}_imgs_per_sec_per_chip" if not tiny
        else f"{metric}_tiny_imgs_per_sec (TINY MODE)",
        "value": round(imgs_per_sec, 3),
        "unit": "imgs/s",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }
    print(json.dumps(result))
    if os.environ.get("BENCH_VERBOSE"):
        print(f"# model={model} batch={batch} iters={iters} gen_s={dt:.2f} "
              f"compile_s={compile_s:.1f} platform={jax.devices()[0].platform}")
    return result


if __name__ == "__main__":
    main()
