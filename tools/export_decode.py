#!/usr/bin/env python
"""Export the watermarked generation pipeline as serialized StableHLO.

The deployment counterpart of ``tools/export_syncseal.py`` for the image
frontends: three artifacts that together run the whole watermark pipeline
from any PJRT runtime (TPU serving container, IFRT proxy, ...) without this
package or Python:

  <model>_sample.stablehlo   (class_ids [B], rng key)  -> codes  [B, T]
      the ENTIRE generation program — prefill + N decode steps with the
      greenlist bias fused + CFG + top-k/top-p — one StableHLO module with
      the weights baked in (the reference ships TorchScript only for
      syncseal; its generation loop cannot be exported, it is host code
      driving CUDA graphs).
  <model>_decode.stablehlo   codes  [B, T]  -> images [B, H, W, 3]
  <model>_detect.stablehlo   codes  [B, T]  -> p-values [B]

  python tools/export_decode.py --tiny --model rar --outdir export/ --self_test
  python tools/export_decode.py --model rar --rar_size rar_xl \\
      --modelpath ckpts/rar --outdir export/

Weights are baked into the module (like the syncseal export): the blob is
the deployment unit. Batch size is static per export (XLA serving shape).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["taming", "rar"], default="rar")
    p.add_argument("--modelpath", default=None)
    p.add_argument("--rar_size", default="rar_xl")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--outdir", required=True)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--guidance_scale", type=float, default=4.0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=600)
    p.add_argument("--top_p", type=float, default=0.92)
    p.add_argument("--wm_method", default="gentime", choices=["none", "gentime"])
    p.add_argument("--wm_seed_strategy", default="linear")
    p.add_argument("--wm_split_strategy", default="stratifiedrand")
    p.add_argument("--wm_context_size", type=int, default=1)
    p.add_argument("--wm_delta", type=float, default=2.0)
    p.add_argument("--wm_gamma", type=float, default=0.25)
    p.add_argument("--self_test", action="store_true",
                   help="deserialize + compare against the direct call")
    args = p.parse_args(argv)
    # load_wrapper consumes the generate.py namespace; fill the rest
    args.encoder_ft_ckpt = args.decoder_ft_ckpt = None

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    import generate
    from wmar_tpu.core import WatermarkSpec
    from wmar_tpu.core.detect import detect as detect_codes
    from wmar_tpu.models import GenParams

    wrapper = generate.load_wrapper(args)
    apply_wm = args.wm_method == "gentime"
    if apply_wm:
        method = (
            f"{args.wm_seed_strategy}-{args.wm_split_strategy}-"
            f"h={args.wm_context_size}-d={args.wm_delta:.1f}-g={args.wm_gamma:.2f}"
        )
        spec = WatermarkSpec.from_string(
            method, vocab_size=wrapper.get_total_vocab_size(),
            spatial_dim=wrapper.codes_size)
        wrapper.set_watermarker(spec)
    gen = GenParams(temperature=args.temperature, top_k=args.top_k,
                    top_p=args.top_p, guidance_scale=args.guidance_scale,
                    guidance_scale_pow=0.0)

    def sample(class_ids, rng_raw):
        # consumers pass the key as raw uint32[2] (StableHLO has no key type)
        rng = jax.random.wrap_key_data(rng_raw)
        return wrapper.sample(class_ids, gen, apply_watermark=apply_wm, rng=rng)

    def decode(codes):
        return wrapper.codes_to_images(codes)

    def detect_fn(codes):
        return detect_codes(wrapper.watermark_spec, wrapper.greenlist, codes)

    ids = jax.ShapeDtypeStruct((args.batch,), jnp.int32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    seq_len = int(wrapper.codes_size) ** 2
    codes_t = jax.ShapeDtypeStruct((args.batch, seq_len), jnp.int32)

    targets = [("sample", sample, (ids, key)), ("decode", decode, (codes_t,))]
    if apply_wm:
        targets.append(("detect", detect_fn, (codes_t,)))

    os.makedirs(args.outdir, exist_ok=True)
    paths = {}
    for name, fn, shapes in targets:
        exp = jexport.export(jax.jit(fn))(*shapes)
        blob = exp.serialize()
        paths[name] = os.path.join(args.outdir, f"{args.model}_{name}.stablehlo")
        with open(paths[name], "wb") as f:
            f.write(blob)
        print(f"wrote {paths[name]} ({len(blob)} bytes)")

    if args.self_test:
        rng = jax.random.PRNGKey(0)
        cls = jnp.arange(args.batch, dtype=jnp.int32) % 10
        rng_raw = jax.random.key_data(rng).astype(jnp.uint32)
        with open(paths["sample"], "rb") as f:
            exp_s = jexport.deserialize(f.read())
        got_codes = exp_s.call(cls, rng_raw)
        want_codes = sample(cls, rng_raw)
        np.testing.assert_array_equal(np.asarray(got_codes), np.asarray(want_codes))
        print(f"self-test sample: OK {np.asarray(got_codes).shape}")
        with open(paths["decode"], "rb") as f:
            exp_d = jexport.deserialize(f.read())
        got_imgs = exp_d.call(got_codes)
        np.testing.assert_allclose(np.asarray(got_imgs),
                                   np.asarray(decode(want_codes)), atol=2e-3)
        print(f"self-test decode: OK {np.asarray(got_imgs).shape}")
        if apply_wm:
            with open(paths["detect"], "rb") as f:
                exp_p = jexport.deserialize(f.read())
            got_p = np.asarray(exp_p.call(got_codes))
            want_p = np.asarray(detect_fn(want_codes))
            np.testing.assert_allclose(got_p, want_p, rtol=1e-5, atol=1e-9)
            assert (got_p < 0.05).all(), f"watermark not detected: {got_p}"
            print(f"self-test detect: OK pvalues {got_p}")


if __name__ == "__main__":
    main()
