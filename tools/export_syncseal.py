#!/usr/bin/env python
"""Export SyncSeal embed/detect/unwarp as serialized StableHLO functions.

Counterpart of the reference's TorchScript deployment export
(``syncseal/syncseal/models/scripted.py``: ``SyncModelJIT`` with
embed/detect/unwarp + a self-test): `jax.export` serializes the jitted
functions with their weights baked in, so a consumer can run sync without
this package (any PJRT runtime that loads StableHLO).

  python tools/export_syncseal.py --ckpt out/syncmodel.msgpack --outdir export/
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="SyncSealRef msgpack (or torch .pth)")
    p.add_argument("--outdir", required=True)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--tiny", action="store_true", help="tiny configs (smoke test)")
    p.add_argument("--self_test", action="store_true",
                   help="round-trip the export (scripted.py test_sync_jit)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from wmar_tpu.sync import syncseal_models as sm
    from wmar_tpu.sync.syncseal import SyncSealRef

    if args.tiny:
        unet_cfg = sm.UNetConfig(z_channels=8, num_blocks=1,
                                 z_channels_mults=(1, 2), norm_groups=4)
        cn_cfg = sm.ConvNeXtConfig(depths=(1, 1), dims=(8, 16))
        model = SyncSealRef.init(0, unet_cfg=unet_cfg, convnext_cfg=cn_cfg)
        if os.path.exists(args.ckpt):
            from wmar_tpu.utils import checkpoint as ckpt_io

            state = ckpt_io.load_pytree(args.ckpt, {"unet": model.unet_params,
                                                    "convnext": model.convnext_params})
            model = SyncSealRef(state["unet"], state["convnext"],
                                unet_cfg=unet_cfg, convnext_cfg=cn_cfg)
    elif args.ckpt.endswith((".pt", ".pth", ".safetensors")):
        model = SyncSealRef.load_torch(args.ckpt)
    else:
        model = SyncSealRef.load(args.ckpt)

    os.makedirs(args.outdir, exist_ok=True)
    shape = (args.batch, args.image_size, args.image_size, 3)
    x = jax.ShapeDtypeStruct(shape, jnp.float32)

    def embed(imgs):
        return model.add_sync(imgs)

    def detect(imgs):
        return model.detect01(model.convnext_params, (imgs + 1.0) / 2.0)

    def unwarp(imgs):
        return model.remove_sync(imgs)

    for name, fn in [("embed", embed), ("detect", detect), ("unwarp", unwarp)]:
        exp = jexport.export(jax.jit(fn))(x)
        blob = exp.serialize()
        path = os.path.join(args.outdir, f"syncseal_{name}.stablehlo")
        with open(path, "wb") as f:
            f.write(blob)
        print(f"wrote {path} ({len(blob)} bytes)")

    if args.self_test:
        import numpy as np

        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.uniform(-1, 1, size=shape).astype(np.float32))
        for name, fn in [("embed", embed), ("detect", detect), ("unwarp", unwarp)]:
            with open(os.path.join(args.outdir, f"syncseal_{name}.stablehlo"), "rb") as f:
                exp = jexport.deserialize(f.read())
            got = exp.call(imgs)
            want = fn(imgs)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)
            print(f"self-test {name}: OK {np.asarray(got).shape}")


if __name__ == "__main__":
    main()
