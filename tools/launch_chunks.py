#!/usr/bin/env python
"""Expand a configs/*.json sweep into chunk-parallel commands.

Counterpart of the reference's meta-launcher format (``configs/*.json`` with
cmd/params/meta, expanded by ``configs/taming_generate.sh``): prints or runs
one command per chunk, each with ``--chunk_id i --num_chunks N``.

  python tools/launch_chunks.py configs/rar_generate.json            # print
  python tools/launch_chunks.py configs/rar_generate.json --run      # serial
"""

from __future__ import annotations

import argparse
import json
import shlex
import subprocess
import sys


def expand(config_path: str):
    with open(config_path) as f:
        cfg = json.load(f)
    base = cfg["cmd"].split()
    params = cfg.get("params", {})
    chunks = int(cfg.get("meta", {}).get("chunks", 1))
    cmds = []
    for chunk in range(chunks):
        cmd = list(base)
        for k, v in params.items():
            cmd += [f"--{k}", str(v)]
        if chunks > 1:
            cmd += ["--chunk_id", str(chunk), "--num_chunks", str(chunks)]
        cmds.append(cmd)
    return cmds


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--run", action="store_true", help="execute serially instead of printing")
    args = p.parse_args(argv)
    cmds = expand(args.config)
    for cmd in cmds:
        line = " ".join(shlex.quote(c) for c in cmd)
        print(line)
        if args.run:
            subprocess.run(cmd, check=True)
    return cmds


if __name__ == "__main__":
    main(sys.argv[1:])
