#!/usr/bin/env python
"""Expand a configs/*.json sweep into one command line per cell.

Counterpart of the reference's meta-launcher format (``configs/*.json`` with
cmd/params/meta, e.g. reference configs/chameleon_generate.json:1-48),
supporting its full grammar:

- scalar value          -> ``--key value``
- JSON bool             -> ``--key true|false`` (entry points use str2bool)
- list value            -> sweep axis: cross-product over the values
                           (this is how the reference encodes 25-way
                           ``chunk_id`` chunking and sync on/off sweeps)
- dict value            -> linked axis: each dict key is a candidate value
                           for this param, mapping to extra params that
                           apply only in that cell (themselves expandable,
                           e.g. encoder_ft_ckpt -> {path: {decoder_ft_ckpt:
                           ..., sync: [true,false]}})
- meta.dest-arg: "yes"  -> append ``--<meta.dest-name> <outbase>/<meta.name>/
                           <cell index>`` when the param is absent
- meta.chunks: N        -> shorthand for a chunk_id axis of range(N) plus
                           ``--num_chunks N`` (this repo's older configs)

  python tools/launch_chunks.py configs/rar_generate.json            # print
  python tools/launch_chunks.py configs/rar_generate.json --run      # serial
"""

from __future__ import annotations

import argparse
import itertools
import json
import shlex
import subprocess
import sys


def _fmt(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _expand_params(params: dict):
    """Yield flat {key: scalar} dicts — the cross-product of all axes."""
    axes = []  # list of lists of {key: scalar} partial assignments
    for k, v in params.items():
        if isinstance(v, list):
            axes.append([{k: choice} for choice in v])
        elif isinstance(v, dict):
            options = []
            for choice, linked in v.items():
                for sub in _expand_params(linked):
                    cell = {k: choice}
                    cell.update(sub)
                    options.append(cell)
            axes.append(options)
        else:
            axes.append([{k: v}])
    for combo in itertools.product(*axes):
        flat = {}
        for part in combo:
            flat.update(part)
        yield flat


def expand(config_path: str, outbase: str = "out"):
    with open(config_path) as f:
        cfg = json.load(f)
    base = cfg["cmd"].split()
    # Both ``python3`` (reference configs) and ``python`` run this venv.
    if base and base[0] == "python3":
        base[0] = "python"
    params = dict(cfg.get("params", {}))
    meta = cfg.get("meta", {})
    chunks = int(meta.get("chunks", 1))
    if chunks > 1 and "chunk_id" not in params:
        params["chunk_id"] = list(range(chunks))
        params["num_chunks"] = chunks

    cmds = []
    for i, cell in enumerate(_expand_params(params)):
        cmd = list(base)
        for k, v in cell.items():
            cmd += [f"--{k}", _fmt(v)]
        if meta.get("dest-arg") == "yes" and meta.get("dest-name"):
            dest = meta["dest-name"]
            if dest not in cell:
                cmd += [f"--{dest}", f"{outbase}/{meta.get('name', 'sweep')}/{i}"]
        cmds.append(cmd)
    return cmds


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--outbase", default="out", help="dest root for meta.dest-arg configs")
    p.add_argument("--run", action="store_true", help="execute serially instead of printing")
    args = p.parse_args(argv)
    cmds = expand(args.config, outbase=args.outbase)
    for cmd in cmds:
        line = " ".join(shlex.quote(c) for c in cmd)
        print(line)
        if args.run:
            subprocess.run(cmd, check=True)
    return cmds


if __name__ == "__main__":
    main(sys.argv[1:])
