#!/usr/bin/env python
"""Watermarked generation + robustness evaluation (TPU-native).

Counterpart of the reference's ``generate.py``: sample watermarked codes
with a model frontend, decode to images, run the attack grid, re-tokenize,
detect, and write the per-sample result tree. Same CLI surface:

  python generate.py --model taming --modelpath ckpts/taming \\
      --wm_method gentime --wm_seed_strategy linear \\
      --wm_split_strategy stratifiedrand --wm_context_size 1 \\
      --wm_delta 2.0 --wm_gamma 0.25 \\
      --conditioning 0,1,2 --num_samples_per_conditioning 5 \\
      --outdir out/ --batch_size 5 --top_k 250 --top_p 0.92

Model checkpoints are converted param pytrees (see ``tools/convert_ckpt.py``)
stored as msgpack under ``--modelpath``:
  taming: gpt.msgpack + vqgan.msgpack (+ config.json)
  rar:    rar_{size}.msgpack + maskgit_vqgan.msgpack
``--tiny`` runs a randomly-initialized tiny model end-to-end (CI smoke path).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def str2bool(v):
    if isinstance(v, bool):
        return v
    return v.lower() in ("yes", "true", "t", "y", "1")


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--model", type=str, choices=["taming", "rar", "chameleon7b"], default="taming")
    p.add_argument("--modelpath", type=str, default=None)
    p.add_argument("--rar_size", type=str, default="rar_xl",
                   choices=["rar_b", "rar_l", "rar_xl", "rar_xxl"])
    p.add_argument("--encoder_ft_ckpt", type=str, default=None, help="RCC encoder delta (msgpack)")
    p.add_argument("--decoder_ft_ckpt", type=str, default=None, help="RCC decoder delta (msgpack)")
    p.add_argument("--tiny", action="store_true", help="random tiny model (smoke test)")
    p.add_argument("--cache_dtype", type=str, default=None,
                   choices=["bf16", "f32", "int8", "packed", "packed4"],
                   help="KV-cache dtype override; int8 halves decode-attention "
                        "HBM reads (~0.4%% quantization noise, not token-exact); "
                        "packed = int8 in the [T, H*D] layout driven by the "
                        "batch-blocked Pallas decode kernel; packed4 packs K+V "
                        "nibbles into one byte (bench default, PERFORMANCE.md)")
    p.add_argument("--weight_dtype", type=str, default=None,
                   choices=["int8", "int4"],
                   help="weight-only int8 for the generator's linears "
                        "(RAR/taming/chameleon): per-output-channel absmax, "
                        "weights stream from HBM as int8; activations stay "
                        "bf16. Not token-exact")

    p.add_argument("--num_samples_per_conditioning", type=int, default=1)
    p.add_argument("--conditioning", type=str, default="0",
                   help="comma-separated class ids, or a prompt txt file")

    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--top_k", type=int, default=600)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_p", type=float, default=0.92)
    p.add_argument("--guidance_scale", type=float, default=4.0)

    p.add_argument("--chunk_id", type=int, default=0)
    p.add_argument("--num_chunks", type=int, default=1)
    p.add_argument("--dp", type=int, default=1,
                   help="shard each batch over this many local devices "
                        "(data-parallel mesh; 0 = all local devices). "
                        "Token-identical to --dp 1; integer conditionings only")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel devices (chameleon7b: megatron-style "
                        "qkv/FFN/vocab sharding via llama_tp_specs; composes "
                        "with --dp). Logit-identical to --tp 1")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel devices for the prompt prefill "
                        "(chameleon7b: ring attention over an sp mesh axis, "
                        "parallel/ring.py; composes with --dp/--tp). "
                        "Token-identical to --sp 1")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel devices for the prompt prefill "
                        "(chameleon7b: GPipe over a pp mesh axis, "
                        "parallel/pipeline.py). Token-identical to --pp 1")

    p.add_argument("--orig_only", type=str2bool, default=False)
    p.add_argument("--include_neural_compress", type=str2bool, default=False)
    p.add_argument("--nc_weights_dir", type=str, default=None,
                   help="dir of codec weights ({name}.msgpack converted pytrees or "
                        "{name}.pth raw compressai / {name}.safetensors diffusers)")
    p.add_argument("--nc_allow_random", type=str2bool, default=False,
                   help="explicitly acknowledge running codecs with RANDOM weights "
                        "(destruction, not compression; rows are tagged)")
    p.add_argument("--include_diffpure", type=str2bool, default=False)
    p.add_argument("--diffpure_weights", type=str, default=None,
                   help="converted ADM UNet msgpack (required for diffpure)")
    p.add_argument("--max_roundtrips", type=int, default=1)
    p.add_argument("--exact_jpeg", type=str2bool, default=False)

    p.add_argument("--wm_method", type=str, default="gentime", choices=["none", "gentime"])
    p.add_argument("--wm_seed_strategy", type=str, default="linear",
                   choices=["fixed", "linear", "spatial"])
    p.add_argument("--wm_split_strategy", type=str, default="stratifiedrand",
                   choices=["rand", "stratifiedrand", "clustering"])
    p.add_argument("--wm_context_size", type=int, default=1)
    p.add_argument("--wm_delta", type=float, default=2.0)
    p.add_argument("--wm_gamma", type=float, default=0.25)
    p.add_argument("--wm_torch_compat", type=str2bool, default=False,
                   help="bit-exact reference greenlists (host-built tables)")
    p.add_argument("--sync", type=str2bool, default=False)
    p.add_argument("--syncpath", type=str, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no_augs", action="store_true")
    p.add_argument("--interleaved", type=str, default=None,
                   help="prompts file (e.g. assets/interleaved_prompts.txt): "
                        "generate interleaved text+image output per prompt "
                        "instead of t2i (chameleon7b only; reference "
                        "chameleon_wrapper.py:108-134)")
    p.add_argument("--max_images", type=int, default=1,
                   help="max image segments per interleaved generation")
    p.add_argument("--text_gen_len", type=int, default=64,
                   help="max tokens per interleaved text segment")
    return p


def run_interleaved(args, wrapper, apply_wm):
    """Interleaved text+image generation over a prompts file.

    Mirrors the reference's interleaved path (``wmar/models/
    chameleon_wrapper.py:108-134`` ``sample_interleaved`` + the
    ``split_token_sequence`` segment contract) but drives the fused
    single-scan sampler. Per prompt, writes ``p=<idx>,idx=<s>/``:
    ``prompt.txt``, ``seg<k>_text.{txt,npy}`` for text segments, and
    ``seg<k>_img.{png,npy,json}`` for image segments — the json carries
    watermark p-values on both the raw generated codes and the
    re-tokenized (decode->encode roundtrip) codes, the detection the
    standard pipeline measures.
    """
    from wmar_tpu.core.detect import detect
    from wmar_tpu.eval.pipeline import to_pillow
    from wmar_tpu.models import GenParams
    from wmar_tpu.models.chameleon_interleaved import (
        TextGenOptions,
        sample_interleaved_fused,
    )

    if not hasattr(wrapper, "llama_params"):
        raise SystemExit("--interleaved is the chameleon7b path")
    with open(args.interleaved) as f:
        prompts = [ln.strip() for ln in f if ln.strip()]
    prompts = prompts[args.chunk_id::args.num_chunks]
    text_opts = TextGenOptions(max_gen_len=args.text_gen_len,
                               temp=args.temperature, top_p=args.top_p)
    gen = GenParams(temperature=args.temperature, top_k=args.top_k,
                    top_p=args.top_p, guidance_scale=args.guidance_scale,
                    guidance_scale_pow=0.0)
    records = []
    for pi, prompt in enumerate(prompts):
        for si in range(args.num_samples_per_conditioning):
            rng = jax.random.fold_in(jax.random.PRNGKey(args.seed),
                                     pi * 131071 + si)
            segs = sample_interleaved_fused(
                wrapper, prompt, gen, text_opts=text_opts,
                max_images=args.max_images, apply_watermark=apply_wm, rng=rng)
            d = os.path.join(args.outdir, f"p={pi},idx={si}")
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "prompt.txt"), "w") as f:
                f.write(prompt + "\n")
            for k, (kind, toks) in enumerate(segs):
                toks = np.asarray(toks)
                if kind == "text_seg":
                    np.save(os.path.join(d, f"seg{k}_text.npy"), toks)
                    with open(os.path.join(d, f"seg{k}_text.txt"), "w") as f:
                        f.write(" ".join(str(t) for t in toks[0]) + "\n")
                    continue
                if toks.shape[1] != wrapper.image_seq_len:
                    # generation budget ran out mid-image: not decodable
                    print(f"skipping truncated image segment {k} "
                          f"({toks.shape[1]}/{wrapper.image_seq_len} tokens)")
                    continue
                imgs = wrapper.codes_to_images(jnp.asarray(toks))
                to_pillow(np.asarray(imgs)[0]).save(
                    os.path.join(d, f"seg{k}_img.png"))
                np.save(os.path.join(d, f"seg{k}_img.npy"), toks)
                rec = {"prompt": prompt, "segment": k}
                if apply_wm:
                    recodes = wrapper.images_to_codes(imgs).reshape(toks.shape[0], -1)
                    rec["pvalue_raw"] = float(detect(
                        wrapper.watermark_spec, wrapper.greenlist,
                        jnp.asarray(toks))[0])
                    rec["pvalue_roundtrip"] = float(detect(
                        wrapper.watermark_spec, wrapper.greenlist, recodes)[0])
                with open(os.path.join(d, f"seg{k}_img.json"), "w") as f:
                    json.dump(rec, f, indent=1)
                records.append(rec)
    print(f"wrote {len(records)} interleaved image segments to {args.outdir}")
    return records


def load_wrapper(args):
    from wmar_tpu.models import (
        GPTConfig,
        MASKGIT_IMAGENET_F16,
        MaskGitVQConfig,
        MaskGitVQGAN,
        RARConfig,
        RarARMM,
        TAMING_IMAGENET_F16,
        TamingARMM,
        TamingVQGAN,
        VQGANConfig,
        init_gpt_params,
        init_rar_params,
        rar_config,
    )
    from wmar_tpu.utils import checkpoint as ckpt

    if args.tiny:
        if args.model == "chameleon7b":
            from wmar_tpu.models import ChameleonARMM, ChameleonVocab, LlamaConfig
            from wmar_tpu.models.llama import init_llama_params

            vocab = ChameleonVocab.synthetic(n_codes=16, n_text=20)
            lcfg = LlamaConfig(dim=32, n_layers=2, n_heads=4,
                               vocab_size=vocab.vocab_size, multiple_of=16,
                               qk_normalization=True)
            vq_cfg = VQGANConfig(resolution=8, ch=32, ch_mult=(1, 2),
                                 num_res_blocks=1, attn_resolutions=(),
                                 z_channels=32, n_embed=16, embed_dim=8)
            vq = TamingVQGAN(vq_cfg)
            vq_params = vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
            params = init_llama_params(jax.random.PRNGKey(1), lcfg)
            tok = lambda text: [6 + (ord(c) % 20) for c in text[:5]]  # noqa: E731
            return ChameleonARMM(params, lcfg, vocab, vq_params, vq_cfg,
                                 tokenizer=tok, image_seq_len=16,
                                 cache_dtype=jnp.float32)
        if args.model == "rar":
            rar_cfg = RARConfig(embed_dim=64, depth=2, num_heads=2, intermediate_size=128,
                                image_seq_len=16, codebook_size=64, num_classes=10)
            vq_cfg = MaskGitVQConfig(resolution=8, hidden_channels=32, channel_mult=(1, 2),
                                     num_res_blocks=1, z_channels=16, n_embed=64, embed_dim=16)
            vq = MaskGitVQGAN(vq_cfg)
            vq_params = vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
            params = init_rar_params(jax.random.PRNGKey(1), rar_cfg)
            return RarARMM(params, rar_cfg, vq_params, vq_cfg, cache_dtype=jnp.float32)
        gpt_cfg = GPTConfig(vocab_size=64, block_size=300, n_layer=2, n_head=2, n_embd=32)
        vq_cfg = VQGANConfig(resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                             attn_resolutions=(16,), z_channels=32, n_embed=64, embed_dim=16)
        vq = TamingVQGAN(vq_cfg)
        vq_params = vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        gpt_params = init_gpt_params(jax.random.PRNGKey(1), gpt_cfg)
        return TamingARMM(gpt_params, gpt_cfg, vq_params, vq_cfg)

    assert args.modelpath, "--modelpath required without --tiny"
    cfg_path = os.path.join(args.modelpath, "config.json")
    meta = json.load(open(cfg_path)) if os.path.exists(cfg_path) else {}

    def load(name, like):
        return ckpt.load_pytree(os.path.join(args.modelpath, name), like)

    if args.model == "rar":
        rar_cfg = rar_config(args.rar_size)
        vq_cfg = MASKGIT_IMAGENET_F16
        vq = MaskGitVQGAN(vq_cfg)
        vq_like = jax.eval_shape(lambda: vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3))))
        vq_params = load("maskgit_vqgan.msgpack", jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), vq_like))
        rar_like = jax.eval_shape(lambda: init_rar_params(jax.random.PRNGKey(0), rar_cfg))
        rar_params = load(f"{args.rar_size}.msgpack", jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), rar_like))
        alive = _load_alive_ids(meta.get("alive_ids", "assets/rar_all_ids.txt"))
        wrapper = RarARMM(rar_params, rar_cfg, vq_params, vq_cfg, alive_ids=alive)
    elif args.model == "taming":
        gpt_cfg = GPTConfig(**meta.get(
            # published cin_transformer geometry; 1664 % n_head must be 0
            # (reference mingpt.py:51) — taming's net2net GPTs use 16 heads
            "gpt", dict(vocab_size=16384, block_size=512, n_layer=48, n_head=16, n_embd=1664)
        ))
        vq_cfg = TAMING_IMAGENET_F16
        vq = TamingVQGAN(vq_cfg)
        vq_like = jax.eval_shape(lambda: vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3))))
        vq_params = load("vqgan.msgpack", jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), vq_like))
        gpt_like = jax.eval_shape(lambda: init_gpt_params(jax.random.PRNGKey(0), gpt_cfg))
        gpt_params = load("gpt.msgpack", jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), gpt_like))
        alive = _load_alive_ids(meta.get("alive_ids", "assets/vqgan_alive_ids.txt"))
        wrapper = TamingARMM(gpt_params, gpt_cfg, vq_params, vq_cfg, alive_ids=alive)
    else:  # chameleon7b
        from wmar_tpu.models import CHAMELEON_F16, CHAMELEON_7B, ChameleonARMM, ChameleonVocab
        from wmar_tpu.models.llama import init_llama_params

        vocab = ChameleonVocab.from_tokenizer_json(
            os.path.join(args.modelpath, "tokenizer", "text_tokenizer.json")
        )
        llama_cfg = CHAMELEON_7B
        vq_cfg = CHAMELEON_F16
        vq = TamingVQGAN(vq_cfg)
        vq_like = jax.eval_shape(lambda: vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3))))
        vq_params = load("vqgan.msgpack", jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), vq_like))
        llama_like = jax.eval_shape(lambda: init_llama_params(jax.random.PRNGKey(0), llama_cfg))
        llama_params = load("llama7b.msgpack", jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), llama_like))
        try:
            from tokenizers import Tokenizer

            tok = Tokenizer.from_file(
                os.path.join(args.modelpath, "tokenizer", "text_tokenizer.json")
            )
            tokenizer_fn = lambda s: tok.encode(s).ids  # noqa: E731
        except ImportError:
            tokenizer_fn = None
        alive = _load_alive_ids(meta.get("alive_ids", "assets/chameleon_all_ids.txt"))
        wrapper = ChameleonARMM(
            llama_params, llama_cfg, vocab, vq_params, vq_cfg,
            tokenizer=tokenizer_fn, alive_ids=alive,
        )

    # RCC deltas (published artifact format): additive patches on the
    # tokenizer encoder / decoder subtrees.
    if args.encoder_ft_ckpt or args.decoder_ft_ckpt:
        params = dict(wrapper.vq_params["params"])
        if args.encoder_ft_ckpt:
            params["encoder"] = ckpt.load_and_apply_delta(args.encoder_ft_ckpt, params["encoder"])
        if args.decoder_ft_ckpt:
            params["decoder"] = ckpt.load_and_apply_delta(args.decoder_ft_ckpt, params["decoder"])
        wrapper.vq_params = {"params": params}
    return wrapper


def _load_alive_ids(path):
    if not path or not os.path.exists(path):
        return None
    ids = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                ids.extend(int(x) for x in line.split(","))
    return np.asarray(ids)


def main(argv=None):
    args = get_parser().parse_args(argv)
    # Sweep configs pass the literal string "none" for absent checkpoints
    # (reference generate.py:327-330 treats it as unset); mirror that.
    for attr in ("encoder_ft_ckpt", "decoder_ft_ckpt", "syncpath", "modelpath"):
        if getattr(args, attr, None) == "none":
            setattr(args, attr, None)
    from wmar_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from wmar_tpu.augmentations import AugmentationManager
    from wmar_tpu.core import WatermarkSpec
    from wmar_tpu.eval import EvalParams, generate_and_evaluate
    from wmar_tpu.models import GenParams

    wrapper = load_wrapper(args)
    if args.cache_dtype:
        wrapper.cache_dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32,
                               "int8": jnp.int8, "packed": "packed",
                               "packed4": "packed4"}[args.cache_dtype]
    if args.weight_dtype in ("int8", "int4"):
        bits = {"int8": 8, "int4": 4}[args.weight_dtype]
        if hasattr(wrapper, "rar_params"):
            from wmar_tpu.models.rar import quantize_rar_params_int8

            wrapper.rar_params = quantize_rar_params_int8(
                wrapper.rar_params, compute_dtype=jnp.bfloat16, bits=bits)
        elif hasattr(wrapper, "gpt_params"):
            from wmar_tpu.models.taming_gpt import quantize_gpt_params_int8

            wrapper.gpt_params = quantize_gpt_params_int8(
                wrapper.gpt_params, compute_dtype=jnp.bfloat16, bits=bits)
        else:
            from wmar_tpu.models.llama import quantize_llama_params_int8

            wrapper.llama_params = quantize_llama_params_int8(
                wrapper.llama_params, compute_dtype=jnp.bfloat16, bits=bits)

    if args.wm_method == "gentime":
        method = (
            f"{args.wm_seed_strategy}-{args.wm_split_strategy}-"
            f"h={args.wm_context_size}-d={args.wm_delta:.1f}-g={args.wm_gamma:.2f}"
        )
        spec = WatermarkSpec.from_string(
            method, vocab_size=wrapper.get_total_vocab_size(), spatial_dim=wrapper.codes_size
        )
        wrapper.set_watermarker(spec, torch_compat=args.wm_torch_compat)
        apply_wm = True
    else:
        apply_wm = False

    if args.interleaved:
        return run_interleaved(args, wrapper, apply_wm)

    if os.path.exists(args.conditioning):
        with open(args.conditioning) as f:
            conds = [line.strip() for line in f if line.strip()]
    else:
        conds = [int(c) for c in args.conditioning.split(",")]
    all_inputs = [c for c in conds for _ in range(args.num_samples_per_conditioning)]

    aug_manager = None
    if not args.orig_only and not args.no_augs:
        nc_models = None
        if args.include_neural_compress:
            from wmar_tpu.augmentations.neural import build_codec_bank

            nc_models = build_codec_bank(
                weights_dir=args.nc_weights_dir,
                allow_random=args.nc_allow_random,
                image_size=wrapper.image_size,
            )
            if not nc_models:
                raise SystemExit(
                    "--include_neural_compress was set but no codec could be "
                    "built; provide --nc_weights_dir with converted checkpoints "
                    "or pass --nc_allow_random true to acknowledge random-weight "
                    "destruction slots."
                )
        diffpure = None
        if args.include_diffpure:
            if not args.diffpure_weights:
                raise SystemExit(
                    "--include_diffpure requires --diffpure_weights "
                    "(256x256_diffusion_uncond.pt or a converted msgpack); "
                    "a random-weight purifier is not DiffPure."
                )
            from wmar_tpu.augmentations.diffpure import (
                ADMUNet,
                DiffPure,
                GUIDED_DIFFUSION_256_UNCOND,
                convert_adm_unet,
            )

            unet = ADMUNet(GUIDED_DIFFUSION_256_UNCOND)
            if args.diffpure_weights.endswith((".pt", ".pth")):
                from wmar_tpu.utils.convert import load_torch_state_dict

                params = jax.tree.map(
                    jnp.asarray,
                    convert_adm_unet(load_torch_state_dict(args.diffpure_weights),
                                     GUIDED_DIFFUSION_256_UNCOND),
                )
            else:
                from wmar_tpu.utils import checkpoint as _ckpt

                like = jax.eval_shape(
                    lambda: unet.init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,), jnp.int32))
                )
                params = _ckpt.load_pytree(
                    args.diffpure_weights,
                    jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), like),
                )
            diffpure = DiffPure(unet, params)
        aug_manager = AugmentationManager(
            include_neural_compress=args.include_neural_compress,
            include_diffpure=args.include_diffpure,
            exact_jpeg=args.exact_jpeg,
            nc_models=nc_models,
            diffpure=diffpure,
        )

    sync_manager = None
    if args.sync:
        from wmar_tpu.sync.manager import SyncManager

        sync_manager = SyncManager.from_path(args.syncpath, image_size=wrapper.image_size)

    gen = GenParams(
        temperature=args.temperature,
        top_k=args.top_k,
        top_p=args.top_p,
        guidance_scale=args.guidance_scale,
        guidance_scale_pow=0.0,
    )
    mesh = None
    if args.dp == 0 or args.dp > 1 or args.tp > 1 or args.sp > 1 or args.pp > 1:
        from wmar_tpu.parallel import make_mesh

        n_par = args.tp * args.sp * args.pp
        dp = (len(jax.devices()) // n_par) if args.dp == 0 else args.dp
        mesh = make_mesh(dp=dp, tp=args.tp, sp=args.sp, pp=args.pp,
                         devices=jax.devices()[: dp * n_par])
        print(f"sharded generation: dp={dp} tp={args.tp} sp={args.sp} pp={args.pp}")
        if str(getattr(wrapper, "cache_dtype", "")).startswith("packed"):
            # hand the mesh to the packed cache so decode attention runs the
            # Pallas kernel per-chip under shard_map instead of falling back
            # to the XLA dequant path (ops/flash_decode.py)
            from wmar_tpu.engine.kvcache import CacheSpec

            wrapper.cache_dtype = CacheSpec(
                dtype=wrapper.cache_dtype, mesh=mesh,
                dp_axis="dp" if dp > 1 else None,
                tp_axis="tp" if args.tp > 1 else None)
        if args.sp > 1 or args.pp > 1:
            if not hasattr(wrapper, "llama_params"):
                raise SystemExit("--sp/--pp > 1 is the chameleon7b prefill path")
            if args.sp > 1:
                wrapper.sp_mesh = mesh
            if args.pp > 1:
                wrapper.pp_mesh = mesh
        if args.tp > 1:
            if not hasattr(wrapper, "llama_params"):
                raise SystemExit("--tp > 1 is the chameleon7b TP path")
            from wmar_tpu.models.llama import llama_tp_specs
            from wmar_tpu.parallel import apply_specs

            wrapper.llama_params = apply_specs(
                mesh, wrapper.llama_params, llama_tp_specs(wrapper.llama_params))

    eval_params = EvalParams(max_roundtrips=args.max_roundtrips, orig_only=args.orig_only)
    records = generate_and_evaluate(
        args.outdir,
        wrapper,
        all_inputs,
        gen,
        eval_params,
        aug_manager,
        batch_size=args.batch_size,
        seed=args.seed,
        chunk_id=args.chunk_id,
        num_chunks=args.num_chunks,
        apply_watermark=apply_wm,
        sync_manager=sync_manager,
        mesh=mesh,
    )
    print(f"wrote {len(records)} records to {args.outdir}")
    return records


if __name__ == "__main__":
    main(sys.argv[1:])
