#!/usr/bin/env python
"""Convert reference PyTorch checkpoints to wmar_tpu msgpack param trees.

  python tools/convert_ckpt.py taming --ckpt net2net.ckpt --outdir ckpts/taming
  python tools/convert_ckpt.py rar --ckpt rar_xl.bin --size rar_xl \\
      --vq maskgit-vqgan-imagenet-f16-256.bin --outdir ckpts/rar
  python tools/convert_ckpt.py chameleon_vqgan --ckpt vqgan_patched.ckpt \\
      --outdir ckpts/chameleon

Host-side only (needs torch-cpu to read the source files).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=[
        "taming", "rar", "chameleon_vqgan", "maskgit_vqgan", "chameleon_llama",
        "wam", "syncseal", "moshi", "mimi", "adm", "compressai", "diffusers_vae",
        "encodec", "dac", "taming_delta", "chameleon_delta", "maskgit_delta",
    ])
    p.add_argument("--base", default=None,
                   help="full tokenizer checkpoint the delta applies to "
                        "(*_delta kinds; --ckpt is the delta .pth itself)")
    p.add_argument("--part", default="encoder", choices=["encoder", "decoder"],
                   help="which tokenizer submodule the delta patches")
    p.add_argument("--name", default=None,
                   help="codec name for compressai/diffusers_vae "
                        "(e.g. cheng2020-anchor-q=3, diffusers-sd-vae-ft-ema)")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--vq", default=None, help="tokenizer ckpt (rar mode)")
    p.add_argument("--size", default="rar_xl")
    p.add_argument("--outdir", required=True)
    p.add_argument("--gpt_layers", type=int, default=48)
    p.add_argument("--gpt_heads", type=int, default=24)
    p.add_argument("--gpt_embd", type=int, default=1664)
    p.add_argument("--gpt_block", type=int, default=512)
    args = p.parse_args(argv)

    from wmar_tpu.models import (
        CHAMELEON_F16,
        GPTConfig,
        MASKGIT_IMAGENET_F16,
        TAMING_IMAGENET_F16,
        rar_config,
    )
    from wmar_tpu.utils import checkpoint as ckpt_io
    from wmar_tpu.utils import convert

    os.makedirs(args.outdir, exist_ok=True)
    sd = convert.load_torch_state_dict(args.ckpt)

    if args.kind == "taming":
        vocab = sd["transformer.tok_emb.weight"].shape[0]
        gpt_cfg = GPTConfig(
            vocab_size=vocab, block_size=args.gpt_block, n_layer=args.gpt_layers,
            n_head=args.gpt_heads, n_embd=args.gpt_embd,
        )
        gpt = convert.convert_taming_gpt(sd, gpt_cfg)
        vq = convert.convert_taming_vqgan(sd, TAMING_IMAGENET_F16, prefix="first_stage_model.")
        ckpt_io.save_pytree(os.path.join(args.outdir, "gpt.msgpack"), gpt)
        ckpt_io.save_pytree(os.path.join(args.outdir, "vqgan.msgpack"), vq)
        # the VQGAN checkpoint's trained PatchGAN discriminator (used by the
        # RCC GAN branch unless --disable_gan, like the reference's
        # VQLPIPSWithDiscriminator)
        for disc_prefix in ("first_stage_model.loss.discriminator.main.",
                            "loss.discriminator.main."):
            if any(k.startswith(disc_prefix) for k in sd):
                from wmar_tpu.finetune.gan import convert_taming_discriminator

                ckpt_io.save_pytree(
                    os.path.join(args.outdir, "discriminator.msgpack"),
                    {"layers": convert_taming_discriminator(sd, disc_prefix)})
                break
        with open(os.path.join(args.outdir, "config.json"), "w") as f:
            json.dump({"gpt": gpt_cfg.__dict__}, f)
    elif args.kind == "rar":
        cfg = rar_config(args.size)
        rar = convert.convert_rar(sd, cfg)
        ckpt_io.save_pytree(os.path.join(args.outdir, f"{args.size}.msgpack"), rar)
        if args.vq:
            vq_sd = convert.load_torch_state_dict(args.vq)
            vq = convert.convert_maskgit_vqgan(vq_sd, MASKGIT_IMAGENET_F16)
            ckpt_io.save_pytree(os.path.join(args.outdir, "maskgit_vqgan.msgpack"), vq)
    elif args.kind == "maskgit_vqgan":
        vq = convert.convert_maskgit_vqgan(sd, MASKGIT_IMAGENET_F16)
        ckpt_io.save_pytree(os.path.join(args.outdir, "maskgit_vqgan.msgpack"), vq)
    elif args.kind.endswith("_delta"):
        # sd (--ckpt) is the published RCC delta with submodule-relative keys
        assert args.base, "--base <full tokenizer checkpoint> required for *_delta"
        base_sd = convert.load_torch_state_dict(args.base)
        if args.kind == "maskgit_delta":
            stage = ""
            fn = lambda s: convert.convert_maskgit_vqgan(s, MASKGIT_IMAGENET_F16)  # noqa: E731
        elif args.kind == "chameleon_delta":
            stage = ""
            fn = lambda s: convert.convert_taming_vqgan(s, CHAMELEON_F16)  # noqa: E731
        else:
            stage = "first_stage_model." if any(
                k.startswith("first_stage_model.") for k in base_sd) else ""
            fn = lambda s: convert.convert_taming_vqgan(  # noqa: E731
                s, TAMING_IMAGENET_F16, prefix=stage)
        tree = convert.convert_vqgan_delta(base_sd, sd, args.part, fn, stage_prefix=stage)
        ckpt_io.save_pytree(
            os.path.join(args.outdir, f"{args.part}_delta.msgpack"), tree)
    elif args.kind == "chameleon_vqgan":
        vq = convert.convert_taming_vqgan(sd, CHAMELEON_F16)
        ckpt_io.save_pytree(os.path.join(args.outdir, "vqgan.msgpack"), vq)
    elif args.kind == "chameleon_llama":
        import glob as _glob

        from wmar_tpu.models import CHAMELEON_7B

        shard_paths = sorted(_glob.glob(args.ckpt)) if "*" in args.ckpt else [args.ckpt]
        shards = [convert.load_torch_state_dict(pth) for pth in shard_paths]
        merged = convert.merge_chameleon_shards(shards)
        params = convert.convert_chameleon_llama(merged, CHAMELEON_7B)
        ckpt_io.save_pytree(os.path.join(args.outdir, "llama7b.msgpack"), params)
    elif args.kind == "wam":
        from wmar_tpu.sync.wam_exact import convert_wam

        ckpt_io.save_pytree(os.path.join(args.outdir, "wam.msgpack"), convert_wam(sd))
    elif args.kind == "syncseal":
        from wmar_tpu.sync import syncseal_models as sm

        unet_prefix = "embedder.unet." if any(k.startswith("embedder.unet.") for k in sd) else "unet."
        cn_prefix = "extractor.convnext." if any(k.startswith("extractor.") for k in sd) else "convnext."
        ckpt_io.save_pytree(os.path.join(args.outdir, "syncseal.msgpack"), {
            "unet": sm.convert_unet(sd, prefix=unet_prefix),
            "convnext": sm.convert_convnext(sd, prefix=cn_prefix,
                                            head_prefix=cn_prefix.replace("convnext.", "head.")),
        })
    elif args.kind == "moshi":
        from wmar_tpu.audio.lm import MOSHI_V01

        params = convert.convert_moshi_lm(sd, MOSHI_V01)
        ckpt_io.save_pytree(os.path.join(args.outdir, "moshi_lm.msgpack"), params)
    elif args.kind == "mimi":
        from wmar_tpu.audio.mimi import MIMI_V0_1, convert_mimi

        ckpt_io.save_pytree(os.path.join(args.outdir, "mimi.msgpack"),
                            convert_mimi(sd, MIMI_V0_1))
    elif args.kind == "adm":
        from wmar_tpu.augmentations.diffpure import GUIDED_DIFFUSION_256_UNCOND, convert_adm_unet

        variables = convert_adm_unet(sd, GUIDED_DIFFUSION_256_UNCOND)
        ckpt_io.save_pytree(os.path.join(args.outdir, "adm_unet.msgpack"), variables)
    elif args.kind == "compressai":
        from wmar_tpu.augmentations import compressai_jax as cj

        if not args.name:
            raise SystemExit("--name required (e.g. cheng2020-anchor-q=3)")
        arch, _ = cj.parse_codec_name(args.name)
        params = cj.convert_compressai(sd, arch)
        ckpt_io.save_pytree(os.path.join(args.outdir, args.name + ".msgpack"), params)
    elif args.kind == "diffusers_vae":
        from wmar_tpu.augmentations.diffusers_vae import KLVAEConfig, convert_kl_vae

        if not args.name:
            raise SystemExit("--name required (e.g. diffusers-sd-vae-ft-ema)")
        cfg = KLVAEConfig.for_name(args.name)
        ckpt_io.save_pytree(os.path.join(args.outdir, args.name + ".msgpack"),
                            convert_kl_vae(sd, cfg))
    elif args.kind == "encodec":
        from wmar_tpu.audio.codecs import ENCODEC_24K, convert_encodec

        ckpt_io.save_pytree(os.path.join(args.outdir, "encodec24k.msgpack"),
                            convert_encodec(sd, ENCODEC_24K))
    elif args.kind == "dac":
        from wmar_tpu.audio.codecs import DAC_24K, convert_dac

        ckpt_io.save_pytree(os.path.join(args.outdir, "dac24k.msgpack"),
                            convert_dac(sd, DAC_24K))
    print(f"wrote {args.outdir}")


if __name__ == "__main__":
    main()
