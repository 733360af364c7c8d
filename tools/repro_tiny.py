#!/usr/bin/env python
"""Tiny-scale end-to-end reproduction of the paper's RCC mechanism.

The reference's central claim (BASELINE.md, from the committed
``notebooks/analyze.ipynb`` outputs and ``logs/0620_taming_ft_stdout.txt``)
is that RCC finetuning the tokenizer lifts decode->encode token match from
0.659 to 0.956 and with augmented training makes watermark detection
survive valuemetric/geometric attacks. The published checkpoints cannot be
fetched here (zero egress), so this tool reproduces the MECHANISM fully
in-environment at toy scale:

1. **Pretrain** a tiny Taming-style tokenizer (decoder + encoder trained
   jointly for code idempotence) and STOP at clean token match ~0.65 — the
   stand-in for the published VQGAN, matching the reference's base
   roundtrip level (0.659).
2. **Generate** watermarked + unwatermarked codes with a tiny GPT through
   the real sampling stack (``linear-stratifiedrand-h=1-d=2.0-g=0.25``,
   the reference's taming watermark config).
3. **RCC-finetune** two ways from the pretrained tokenizer with the real
   training stack (drift anchor to the original decoder + perceptual +
   masked idempotence, ``finetune/rcc.py``): ``FT`` (no augmentations) and
   ``FT+Augs`` (the weak->medium->strong curriculum).
4. **Evaluate** Base vs FT vs FT+Augs over an attack grid
   (decode -> attack -> re-encode -> token match + detection p-value),
   and print an analyzer-formatted table (TPR@1%FPR via the exact-p-value
   thresholding the reference analyzer uses, ``analyzer.py:378``).

Done criterion (locked as a slow regression in tests/test_repro_tiny.py):
token match improves Base -> FT on the clean cell (the 0.659 -> 0.956
direction) and Base -> FT+Augs under every trained augmentation, with
detection TPR improving wherever Base detection is broken.

  python tools/repro_tiny.py --out /tmp/repro       # full tiny run
  python tools/repro_tiny.py --fast --out /tmp/r    # reduced budget
  python tools/repro_tiny.py --family rar --out d   # RAR/MaskGit family
  python tools/repro_tiny.py --audio --out d        # Mimi audio twin
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
from typing import Callable, Dict, List, Optional, Tuple

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
import optax


# ---------------------------------------------------------------------------
# Tiny models
# ---------------------------------------------------------------------------


def build_tiny_tokenizer(seed: int = 0):
    """Tiny taming VQGAN: 32px, 16x16 latents, 64-entry codebook.

    The default taming codebook init (uniform +-1/n_e) is far below the
    idem-MSE floor reachable at this scale, so nearest-neighbor would never
    flip; the repro uses a spread codebook (N(0, 0.5)) instead — the
    published codebooks are likewise O(1)-scaled after training.
    """
    from wmar_tpu.models import TamingVQGAN, VQGANConfig

    vq_cfg = VQGANConfig(resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=(), z_channels=32, n_embed=64,
                         embed_dim=16)
    vq = TamingVQGAN(vq_cfg)
    vq_params = vq.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3)))
    p = dict(vq_params["params"])
    q = dict(p["quantize"])
    q["embedding"] = jax.random.normal(
        jax.random.PRNGKey(seed + 42), q["embedding"].shape) * 0.5
    p["quantize"] = q
    return vq, vq_cfg, {"params": p}


def build_tiny_gpt(vq_cfg, seed: int = 1):
    from wmar_tpu.models import GPTConfig, init_gpt_params

    gpt_cfg = GPTConfig(vocab_size=vq_cfg.n_embed, block_size=300,
                        n_layer=2, n_head=2, n_embd=32)
    return gpt_cfg, init_gpt_params(jax.random.PRNGKey(seed), gpt_cfg)


def build_tiny_maskgit(seed: int = 0):
    """Tiny MaskGit-VQGAN (RAR's tokenizer family): 32px, 16x16 latents,
    64-entry codebook, spread like :func:`build_tiny_tokenizer`."""
    from wmar_tpu.models import MaskGitVQConfig, MaskGitVQGAN

    vq_cfg = MaskGitVQConfig(resolution=32, hidden_channels=32,
                             channel_mult=(1, 2), num_res_blocks=1,
                             z_channels=16, n_embed=64, embed_dim=16)
    vq = MaskGitVQGAN(vq_cfg)
    vq_params = vq.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3)))
    p = dict(vq_params["params"])
    p["embedding"] = jax.random.normal(
        jax.random.PRNGKey(seed + 42), p["embedding"].shape) * 0.5
    return vq, vq_cfg, {"params": p}


def build_tiny_rar(vq_cfg, seed: int = 1):
    from wmar_tpu.models import RARConfig, init_rar_params

    rar_cfg = RARConfig(embed_dim=64, depth=2, num_heads=2,
                        intermediate_size=128,
                        image_seq_len=vq_cfg.codes_per_side ** 2,
                        codebook_size=vq_cfg.n_embed, num_classes=10)
    return rar_cfg, init_rar_params(jax.random.PRNGKey(seed), rar_cfg)


# ---------------------------------------------------------------------------
# Stage 1: pretrain to the reference's base roundtrip level
# ---------------------------------------------------------------------------


def pretrain_tokenizer(adapter, vocab: int, rng: jax.Array,
                       target_match: float = 0.65, max_steps: int = 1500,
                       batch: int = 8, lr: float = 1e-3,
                       log=print) -> Tuple[dict, float]:
    """Train {decoder, watermark_encoder} jointly for idempotence until the
    clean roundtrip token match reaches ``target_match`` (the reference's
    base tokenizer sits at 0.659, BASELINE.md)."""
    from wmar_tpu.finetune.rcc import validation_l0

    def pre_loss(trainable, codes):
        z_q = adapter.lookup(codes)
        xrec = adapter.decode(trainable["decoder"], z_q)
        zrec = adapter.encode_latent(trainable["watermark_encoder"], xrec)
        idem = ((z_q - zrec) ** 2).mean()
        # keep decoded pixels inside the tokenizer's [-1, 1] range
        range_pen = jnp.maximum(jnp.abs(xrec) - 1.0, 0.0).mean()
        return idem + 10.0 * range_pen

    opt = optax.adam(lr)
    trainable = adapter.init_trainable()
    opt_state = opt.init(trainable)

    @jax.jit
    def step(trainable, opt_state, codes):
        l, g = jax.value_and_grad(pre_loss)(trainable, codes)
        up, opt_state = opt.update(g, opt_state, trainable)
        return optax.apply_updates(trainable, up), opt_state, l

    s = adapter.latent_side
    val = jax.random.randint(jax.random.PRNGKey(1234), (16, s * s), 0, vocab)
    t0 = time.time()
    match = 0.0
    for i in range(1, max_steps + 1):
        rng, k = jax.random.split(rng)
        codes = jax.random.randint(k, (batch, s * s), 0, vocab)
        trainable, opt_state, l = step(trainable, opt_state, codes)
        if i % 25 == 0:
            match = float(1.0 - np.mean(np.asarray(
                validation_l0(adapter, trainable, val))))
            if i % 100 == 0 or match >= target_match:
                log(f"pretrain {i}: loss={float(l):.4f} clean_match={match:.3f} "
                    f"({time.time() - t0:.0f}s)")
            if match >= target_match:
                break
    return trainable, match


# ---------------------------------------------------------------------------
# Stage 3: RCC finetuning (the real stack)
# ---------------------------------------------------------------------------


def rcc_finetune(adapter, schedule: List[Tuple[str, int]], vocab: int,
                 rng: jax.Array, lr: float = 3e-4, batch: int = 8, log=print):
    from wmar_tpu.finetune.rcc import (
        RCCConfig, init_state, make_optimizer, make_train_step,
    )

    cfg = RCCConfig(lr=lr, idem_weight=1.0)
    opt = make_optimizer(cfg)
    state = init_state(adapter, opt)
    s = adapter.latent_side
    t0 = time.time()
    for level, steps in schedule:
        step_fn = jax.jit(make_train_step(adapter, cfg, level, opt))
        m = {}
        for _ in range(steps):
            rng, k1, k2 = jax.random.split(rng, 3)
            codes = jax.random.randint(k1, (batch, s * s), 0, vocab)
            state, m = step_fn(state, codes, k2)
        log(f"rcc[{level}] x{steps}: idem={float(m.get('idem', np.nan)):.4f} "
            f"({time.time() - t0:.0f}s)")
    return state.trainable


# ---------------------------------------------------------------------------
# Stage 4: evaluation
# ---------------------------------------------------------------------------


def eval_augs() -> Dict[str, Optional[Callable]]:
    """Attack grid: the reference's eval families at strengths the
    curriculum trains (plus resize-back crop, which misaligns the token
    grid — the cell the paper needs sync for, reported not asserted)."""
    import wmar_tpu.augmentations.geometric as G
    import wmar_tpu.augmentations.valuemetric as V

    return {
        "none": None,
        "gaussian-noise_0.1": lambda x, k: V.gaussian_noise(x, 0.1, k),
        "jpeg_50": lambda x, k: V.jpeg_diff(x, 50),
        "rotation_3": lambda x, k: G.rotate(x, 3.0),
        "crop-pad_0.6": lambda x, k: G.upper_left_crop_pad_back(x, 0.6),
        "crop-resize_0.6": lambda x, k: G.upper_left_crop_resize_back(x, 0.6),
    }


def evaluate_method(adapter, trainable, codes_wm, codes_null, spec, greenlist,
                    rng: jax.Array, alpha: float = 0.01) -> Dict[str, dict]:
    """decode -> attack -> re-encode -> {token_match, TPR@alpha, null FPR}."""
    from wmar_tpu.core.detect import detect

    def roundtrip(codes, aug_fn, key):
        z_q = adapter.lookup(codes)
        xrec = adapter.decode(trainable["decoder"], z_q)
        x01 = xrec / 2.0 + 0.5
        if aug_fn is not None:
            x01 = jnp.clip(aug_fn(x01, key), 0.0, 1.0)
        zrec = adapter.encode_latent(trainable["watermark_encoder"], x01 * 2.0 - 1.0)
        return adapter.nearest_codes(zrec)

    import zlib

    rt = jax.jit(roundtrip, static_argnums=(1,))
    out = {}
    for name, fn in eval_augs().items():
        # crc32, not builtin hash(): str hashing is PYTHONHASHSEED-salted
        # per process, which would make the attack RNG irreproducible
        key = jax.random.fold_in(rng, zlib.crc32(name.encode()) % (2 ** 31))
        new_wm = rt(codes_wm, fn, key)
        new_null = rt(codes_null, fn, key)
        match = float((np.asarray(new_wm) == np.asarray(codes_wm)).mean())
        pv = np.asarray(detect(spec, greenlist, new_wm))
        pv_null = np.asarray(detect(spec, greenlist, new_null))
        out[name] = {
            "token_match": round(match, 4),
            "tpr": round(float((pv < alpha).mean()), 4),
            "fpr_null": round(float((pv_null < alpha).mean()), 4),
            "median_log10p": round(float(np.median(np.log10(np.maximum(pv, 1e-300)))), 2),
        }
    return out


def format_table(results: Dict[str, Dict[str, dict]]) -> str:
    """Analyzer-style markdown: methods x attack cells."""
    methods = list(results)
    cells = list(next(iter(results.values())))
    lines = ["| metric | attack | " + " | ".join(methods) + " |",
             "|---|---|" + "---|" * len(methods)]
    for metric in ("token_match", "tpr"):
        for cell in cells:
            row = [f"{results[m][cell][metric]:.3f}" for m in methods]
            lines.append(f"| {metric} | {cell} | " + " | ".join(row) + " |")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ReproBudget:
    pretrain_target: float = 0.65
    pretrain_max_steps: int = 1500
    ft_steps: int = 600
    ft_aug_schedule: Tuple[Tuple[str, int], ...] = (
        ("weak", 200), ("medium", 400), ("strong", 500))
    n_eval: int = 32
    batch: int = 8


FAST_BUDGET = ReproBudget(pretrain_max_steps=800, ft_steps=300,
                          ft_aug_schedule=(("weak", 100), ("medium", 250),
                                           ("strong", 300)),
                          n_eval=16)


def run(budget: ReproBudget, seed: int = 0, out: Optional[str] = None,
        family: str = "taming", log=print) -> Dict[str, Dict[str, dict]]:
    from wmar_tpu.core.spec import WatermarkSpec
    from wmar_tpu.finetune.rcc import MaskGitRCCAdapter, TamingRCCAdapter
    from wmar_tpu.models import RarARMM, TamingARMM

    rng = jax.random.PRNGKey(seed)
    if family == "taming":
        vq, vq_cfg, vq_params = build_tiny_tokenizer(seed)
        adapter_cls = TamingRCCAdapter
    elif family == "rar":
        vq, vq_cfg, vq_params = build_tiny_maskgit(seed)
        adapter_cls = MaskGitRCCAdapter
    else:
        raise ValueError(f"unknown family {family!r}")

    # --- stage 1: pretrain to the base roundtrip level
    adapter0 = adapter_cls(vq, vq_params)
    rng, k = jax.random.split(rng)
    base_trainable, base_match = pretrain_tokenizer(
        adapter0, vq_cfg.n_embed, k, target_match=budget.pretrain_target,
        max_steps=budget.pretrain_max_steps, batch=budget.batch, log=log)
    log(f"base tokenizer ({family}): clean token match {base_match:.3f} "
        f"(reference base: 0.659)")

    # freeze as the 'published' tokenizer T0 (both tokenizer families store
    # their conv stacks under the 'encoder'/'decoder' param keys)
    p = dict(vq_params["params"])
    p["decoder"] = base_trainable["decoder"]
    p["encoder"] = base_trainable["watermark_encoder"]
    T0 = {"params": p}
    adapter = adapter_cls(vq, T0)

    # --- stage 2: watermarked generation through the real sampling stack
    # (tiny GPT for taming; tiny RAR with in-batch CFG for the rar family —
    # both reference sweeps use the same watermark string,
    # configs/{taming,rar}_generate.json)
    from wmar_tpu.models import GenParams

    if family == "taming":
        gpt_cfg, gpt_params = build_tiny_gpt(vq_cfg, seed + 1)
        wrapper = TamingARMM(gpt_params, gpt_cfg, T0, vq_cfg)
        gp = GenParams(temperature=1.0)
    else:
        rar_cfg, rar_params = build_tiny_rar(vq_cfg, seed + 1)
        wrapper = RarARMM(rar_params, rar_cfg, T0, vq_cfg,
                          cache_dtype=jnp.float32)
        gp = GenParams(temperature=1.0, guidance_scale=4.0,
                       guidance_scale_pow=0.0)
    spec = WatermarkSpec.from_string(
        "linear-stratifiedrand-h=1-d=2.0-g=0.25",
        vocab_size=vq_cfg.n_embed, spatial_dim=vq_cfg.codes_per_side)
    wrapper.set_watermarker(spec)

    conds = [i % 10 for i in range(budget.n_eval)]
    rng, k1, k2 = jax.random.split(rng, 3)
    codes_wm = wrapper.sample(conds, gp, apply_watermark=True, rng=k1)
    codes_null = wrapper.sample(conds, gp, apply_watermark=False, rng=k2)
    log(f"sampled {codes_wm.shape[0]} watermarked + null code grids")

    # --- stage 3: RCC finetunes
    rng, k1, k2 = jax.random.split(rng, 3)
    log("FT (no augmentations):")
    ft = rcc_finetune(adapter, [("warmup", budget.ft_steps)],
                      vq_cfg.n_embed, k1, batch=budget.batch, log=log)
    log("FT+Augs (curriculum):")
    ft_aug = rcc_finetune(adapter, list(budget.ft_aug_schedule),
                          vq_cfg.n_embed, k2, batch=budget.batch, log=log)

    # --- stage 4: evaluate
    base_params = {"decoder": p["decoder"], "watermark_encoder": p["encoder"]}
    rng, k = jax.random.split(rng)
    results = {}
    for name, trainable in (("base", base_params), ("ft", ft),
                            ("ft_aug", ft_aug)):
        results[name] = evaluate_method(
            adapter, trainable, codes_wm, codes_null,
            wrapper.watermark_spec, wrapper.greenlist, k)
        log(f"{name}: " + json.dumps(results[name]))

    table = format_table(results)
    log("\nBase-vs-FT table (direction of BASELINE.md 0.659 -> 0.956):\n" + table)
    if out:
        os.makedirs(out, exist_ok=True)
        stem = "repro_tiny" if family == "taming" else f"repro_tiny_{family}"
        with open(os.path.join(out, f"{stem}.json"), "w") as f:
            json.dump({"family": family, "base_clean_match": base_match,
                       "results": results}, f, indent=1)
        with open(os.path.join(out, f"{stem}.md"), "w") as f:
            f.write(table + "\n")
        log(f"wrote {out}/{stem}.{{json,md}}")
    return results


# ---------------------------------------------------------------------------
# Audio twin: Mimi RCC -> validation_token_match improves
# ---------------------------------------------------------------------------


def build_tiny_mimi(seed: int = 0):
    """Tiny roundtrip-capable Mimi: dim 16, hop 32 samples/frame, 2 RVQ
    levels of 32 codes.

    Two surgeries make the random init behave like a TRAINED codec (without
    which no amount of encoder training can recover codes):
    * spread codebooks (init 0.02 is far below the reachable idem floor);
    * identity input/output projections — trained Mimi learns these as
      mutual inverses; with random init ``input_proj(output_proj(cb))`` is
      unrelated to ``cb`` so the decode->encode cycle cannot map back.
    """
    import numpy as np

    from wmar_tpu.audio import Mimi, MimiConfig

    cfg = MimiConfig(dimension=16, n_filters=8, ratios=(4, 4),
                     n_residual_layers=1, n_q=2, n_q_semantic=1,
                     cardinality=32, codebook_dim=16,
                     transformer_layers=1, transformer_heads=2, downsample=2)
    mimi = Mimi(cfg)
    variables = mimi.init(jax.random.PRNGKey(seed),
                          jnp.zeros((1, cfg.hop_length * 8, 1)))
    p = dict(variables["params"])
    eye = np.eye(cfg.dimension, dtype=np.float32)
    for rq in ("rvq_first", "rvq_rest"):
        sub = dict(p[rq])
        sub["codebooks"] = sub["codebooks"] / 0.02 * 0.5
        sub["input_proj"] = {"kernel": jnp.asarray(eye)}
        sub["output_proj"] = {"kernel": jnp.asarray(eye)}
        p[rq] = sub
    return mimi, cfg, {"params": p}


def run_audio(pretrain_steps: int = 600, ft_steps: int = 600, seed: int = 0,
              out: Optional[str] = None, log=print) -> Dict[str, dict]:
    """Mimi twin of :func:`run` (VERDICT r4 #1 second assert): pretrain the
    tiny codec to a base roundtrip level with pure idempotence, freeze as
    T0, RCC-finetune with the REAL audio train step
    (``audio/finetune.py:make_train_step``: drift anchor + mrstft + aug
    switch + latent idem), and report per-stream ``validation_token_match``
    before/after under the validation augs."""
    import numpy as np

    import wmar_tpu.audio.augmentations as A
    from wmar_tpu.audio.finetune import (
        MimiFTConfig, MimiFTWrapper, init_state as ft_init_state,
        make_train_step as make_audio_step, validation_token_match,
    )

    mimi, cfg, variables = build_tiny_mimi(seed)
    wrapper = MimiFTWrapper(mimi, variables)
    rng = jax.random.PRNGKey(seed + 11)

    def rand_codes(key, b=4, t=8):
        return jax.random.randint(key, (b, cfg.n_q, t), 0, cfg.cardinality)

    val_codes = rand_codes(jax.random.PRNGKey(9), 8)
    augs = {"none": None,
            "noise_0.01": lambda x, k: A.gaussian_noise(x, 0.01, k)}

    def tm(w, trainable):
        out = {}
        for name, aug in augs.items():
            r = validation_token_match(w, trainable, val_codes, aug_fn=aug,
                                       rng=jax.random.PRNGKey(3))
            out[name] = [round(float(v), 4)
                         for v in np.mean(np.asarray(r), axis=0)]
        return out

    # stage 1: pure-idempotence pretrain to a base roundtrip level
    def pre_loss(trainable, codes):
        z_q = wrapper.codes_to_latent(codes)
        audio = wrapper.decode(trainable, z_q)
        z_rec = wrapper.encode_latent(trainable, audio)
        idem = ((z_rec - z_q) ** 2).mean()
        return idem + 10.0 * jnp.maximum(jnp.abs(audio) - 1.0, 0.0).mean()

    opt = optax.adam(2e-3)
    trainable = wrapper.init_trainable()
    opt_state = opt.init(trainable)

    @jax.jit
    def pre_step(trainable, opt_state, codes):
        l, g = jax.value_and_grad(pre_loss)(trainable, codes)
        up, opt_state = opt.update(g, opt_state, trainable)
        return optax.apply_updates(trainable, up), opt_state, l

    t0 = time.time()
    for i in range(1, pretrain_steps + 1):
        rng, k = jax.random.split(rng)
        trainable, opt_state, l = pre_step(trainable, opt_state, rand_codes(k))
    log(f"mimi pretrain x{pretrain_steps}: loss={float(l):.4f} "
        f"({time.time() - t0:.0f}s)")

    # freeze as the 'published' codec T0
    p2 = dict(variables["params"])
    for k in ("encoder", "enc_transformer", "decoder", "dec_transformer"):
        p2[k] = trainable[k]
    w2 = MimiFTWrapper(mimi, {"params": p2})
    base_tm = tm(w2, w2.init_trainable())
    log(f"mimi base token match: {base_tm}")

    # stage 2: the REAL RCC train step (drift + mrstft + augs + idem)
    ft_cfg = MimiFTConfig(lr=5e-4, code_loss_weight=2.0, aug_prob=0.5)
    ft_opt = optax.adam(ft_cfg.lr)
    state = ft_init_state(w2, ft_opt)
    step = jax.jit(make_audio_step(w2, ft_cfg, ft_opt))
    t0 = time.time()
    for i in range(1, ft_steps + 1):
        r2 = jax.random.fold_in(jax.random.PRNGKey(seed + 55), i)
        k1, k2 = jax.random.split(r2)
        state, m = step(state, rand_codes(k1), k2)
    log(f"mimi RCC x{ft_steps}: idem={float(m['idem']):.4f} "
        f"({time.time() - t0:.0f}s)")
    ft_tm = tm(w2, state.trainable)
    log(f"mimi FT token match: {ft_tm}")

    results = {"base": base_tm, "ft": ft_tm}
    if out:
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "repro_tiny_audio.json"), "w") as f:
            json.dump(results, f, indent=1)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fast", action="store_true", help="reduced budget")
    ap.add_argument("--audio", action="store_true",
                    help="run the Mimi twin instead of the image pipeline")
    ap.add_argument("--family", type=str, default="taming",
                    choices=["taming", "rar"],
                    help="image tokenizer family (taming GPT or RAR/MaskGit)")
    args = ap.parse_args(argv)
    if args.audio:
        return run_audio(seed=args.seed, out=args.out)
    budget = FAST_BUDGET if args.fast else ReproBudget()
    return run(budget, seed=args.seed, out=args.out, family=args.family)


if __name__ == "__main__":
    main()
