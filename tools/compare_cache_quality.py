#!/usr/bin/env python
"""Cache-quantization quality comparison on the watermark pipeline's own
metrics.

The question a default flip needs answered: does int4 cache noise
(``packed4``, absmax/7 per token-head) change what the PIPELINE measures —
greenlist hit fractions and detection p-values — relative to the int8
``packed`` cache? Token-level agreement is a red herring (temperature-1
sampling amplifies any logit jitter into different-but-equally-valid
sequences); the product's quantity is the watermark statistic.

For each cache dtype: sample N watermarked images with the SAME rng,
detect on-device, and report the green-fraction / p-value distributions
plus pairwise deltas.

Usage: python tools/compare_cache_quality.py [--batch 64] [--size rar_xl]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

if not os.environ.get("WMAR_NO_JAX_CACHE"):
    from wmar_tpu.utils import tagged_cache_dir  # host-fingerprinted (cross-host AOT cache changes numerics)
    jax.config.update("jax_compilation_cache_dir", tagged_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=str, default="rar_xl")
    ap.add_argument("--caches", type=str, default="packed,packed4,int8")
    ap.add_argument("--tpr", action="store_true",
                    help="also report detection TPR@p<0.01 under token-"
                         "erosion surrogates of the attack grid (see "
                         "tpr_table docstring for why surrogates)")
    args = ap.parse_args()

    from wmar_tpu.core import HashGreenlist, WatermarkSpec
    from wmar_tpu.core.detect import detect, green_fraction
    from wmar_tpu.core.spec import SeedStrategy, SplitStrategy
    from wmar_tpu.models import (
        GenParams, MASKGIT_IMAGENET_F16, MaskGitVQGAN, RarARMM,
        init_rar_params, rar_config,
    )
    from wmar_tpu.models.rar import quantize_rar_params_int8

    cfg = rar_config(args.size)
    params = init_rar_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    # RAR is adaLN-zero at init: the attention branch is GATED OFF, so cache
    # noise would not reach the logits and any comparison would be vacuous
    # (the published checkpoints have trained, non-zero gates). Give the
    # gates small random values so the caches actually matter.
    rng = np.random.default_rng(9)
    params["blocks"] = [
        {**blk, "adaln": {
            "w": jnp.asarray(rng.standard_normal(blk["adaln"]["w"].shape),
                             jnp.bfloat16) * 0.05,
            "b": blk["adaln"]["b"]}}
        for blk in params["blocks"]
    ]
    params = quantize_rar_params_int8(params, compute_dtype=jnp.bfloat16)
    vq = MaskGitVQGAN(MASKGIT_IMAGENET_F16)
    vq_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        vq.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3))))
    spec = WatermarkSpec(vocab_size=cfg.codebook_size,
                         seed_strategy=SeedStrategy.LINEAR,
                         split_strategy=SplitStrategy.RANDOM,
                         context_size=1, delta=2.0, gamma=0.25)
    gen = GenParams(temperature=1.0, guidance_scale=4.0)
    classes = np.arange(args.batch) % cfg.num_classes
    greenlist = HashGreenlist(spec)

    results = {}
    for cd_name in args.caches.split(","):
        cd = {"packed": "packed", "packed4": "packed4", "int8": jnp.int8,
              "bf16": jnp.bfloat16}[cd_name]
        wrapper = RarARMM(params, cfg, vq_params, MASKGIT_IMAGENET_F16,
                          cache_dtype=cd)
        wrapper.set_watermarker(spec)
        codes = wrapper.sample(classes, gen, apply_watermark=True,
                               rng=jax.random.PRNGKey(7))
        codes = np.asarray(codes)
        cj = jnp.asarray(codes.reshape(codes.shape[0], -1))
        frac = np.asarray(green_fraction(spec, greenlist, cj))
        pvals = np.asarray(detect(spec, greenlist, cj))
        lp = -np.log10(np.maximum(pvals.astype(np.float64), 1e-300))
        results[cd_name] = dict(codes=codes, frac=frac, lp=lp)
        print(f"{cd_name:8s} green-frac mean={frac.mean():.4f} sd={frac.std():.4f}  "
              f"-log10(p) mean={lp.mean():.1f} sd={lp.std():.1f}  "
              f"min={lp.min():.1f}", flush=True)

    names = list(results)
    base = results[names[0]]
    for other in names[1:]:
        r = results[other]
        tok = (base["codes"] == r["codes"]).mean()
        print(f"{names[0]} vs {other}: token agreement {tok:.4f}  "
              f"green-frac delta {abs(base['frac'].mean() - r['frac'].mean()):.4f}  "
              f"-log10(p) delta {abs(base['lp'].mean() - r['lp'].mean()):.2f}",
              flush=True)

    if args.tpr:
        tpr_table(spec, greenlist, results, cfg.codebook_size)


def tpr_table(spec, greenlist, results, vocab, tau=1e-2):
    """Detection TPR@p<tau per cache dtype under token-erosion surrogates.

    Why surrogates and not the pixel attack grid: with random VQGAN weights
    (the only weights available here — zero egress) the decode→encode
    roundtrip replaces ~97% of tokens (measured, assets/golden_e2e.json
    l0≈0.97), i.e. pixel attacks detect at chance for EVERY cache dtype and
    the comparison is vacuous. What pixel attacks do to a *trained*
    tokenizer is erode a fraction of tokens; these surrogates apply that
    erosion directly to the watermarked codes — identical mechanics across
    cache dtypes, same erosion rng — so TPR deltas isolate exactly what the
    flip decision needs: whether int4 cache noise weakens the watermark's
    survival margin. Canonical grid params map ≈ to erosion rates via the
    reference's measured l0 curves (analyzer tables).
    """
    from wmar_tpu.core.detect import detect

    rng = np.random.default_rng(123)
    t = next(iter(results.values()))["codes"].reshape(
        len(next(iter(results.values()))["codes"]), -1).shape[1]
    n = len(next(iter(results.values()))["codes"])

    # shared erosion patterns (same for every cache dtype)
    erosions = {}
    for rate in (0.0, 0.1, 0.25, 0.4, 0.6):
        mask = rng.random((n, t)) < rate
        repl = rng.integers(0, vocab, size=(n, t))
        erosions[f"token-noise {int(rate*100)}%"] = ("noise", mask, repl)
    erosions["crop 50% (window)"] = ("crop", t // 4, t // 4 + t // 2)
    # unwatermarked control: detection on uniform random codes (FPR row)
    rand_codes = rng.integers(0, vocab, size=(n, t))

    names = list(results)
    print(f"\nTPR@p<{tau:g} under token-erosion surrogates "
          f"(n={n}/cell):")
    header = f"{'surrogate':22s} " + " ".join(f"{nm:>8s}" for nm in names)
    print(header)
    for ename, e in erosions.items():
        row = []
        for nm in names:
            codes = results[nm]["codes"].reshape(n, -1)
            if e[0] == "noise":
                _, mask, repl = e
                attacked = np.where(mask, repl, codes)
            else:
                _, lo, hi = e
                attacked = codes[:, lo:hi]
            p = np.asarray(detect(spec, greenlist, jnp.asarray(attacked)))
            row.append((p < tau).mean())
        print(f"{ename:22s} " + " ".join(f"{v:8.3f}" for v in row), flush=True)
    fpr = (np.asarray(detect(spec, greenlist, jnp.asarray(rand_codes))) < tau).mean()
    print(f"{'FPR (random codes)':22s} {fpr:8.3f}")


if __name__ == "__main__":
    main()
