#!/usr/bin/env python
"""Minimal end-to-end demo — the counterpart of the reference's
``notebooks/colab.ipynb`` (RAR + watermark + attacks + detection + report).

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python examples/minimal_e2e.py --outdir /tmp/wmar_demo

Runs the full pipeline at tiny scale (random weights unless you pass
converted checkpoints): watermarked generation -> sync (optional) -> the
classic attack grid -> re-tokenize -> detect -> one-command analyzer report
with tables + figures.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="/tmp/wmar_demo")
    p.add_argument("--model", default="taming", choices=["taming", "rar", "chameleon7b"])
    p.add_argument("--num", type=int, default=4)
    p.add_argument("--modelpath", default=None, help="converted checkpoint dir (tiny random otherwise)")
    args = p.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gen_cmd = [
        sys.executable, os.path.join(root, "generate.py"),
        "--outdir", args.outdir, "--model", args.model,
        "--conditioning", "0,1", "--num_samples_per_conditioning", str(args.num // 2),
        "--batch_size", "2", "--max_roundtrips", "1",
        "--wm_method", "gentime",
        "--wm_seed_strategy", "linear", "--wm_split_strategy", "stratifiedrand",
        "--wm_context_size", "1", "--wm_delta", "2.0", "--wm_gamma", "0.25",
    ]
    if args.modelpath:
        gen_cmd += ["--modelpath", args.modelpath]
    else:
        gen_cmd += ["--tiny"]
    print("+", " ".join(gen_cmd))
    subprocess.run(gen_cmd, check=True)

    rep_cmd = [sys.executable, "-m", "wmar_tpu.eval.analyzer", args.outdir]
    print("+", " ".join(rep_cmd))
    subprocess.run(rep_cmd, check=True, cwd=root)
    print(f"done — see {args.outdir}/report/report.md")


if __name__ == "__main__":
    main()
