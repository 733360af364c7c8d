"""Reconstruct finetuned weights from base + delta checkpoints (CLI).

Counterpart of the reference's standalone delta tooling:
``wmar_audio/training/apply_deltas.py:1-124`` (reconstruct a finetuned Mimi
from a delta file against the original) and ``wmar/utils/utils.py:47-66``
(``update_weights(delta=True)`` additive patch-in for the RCC VQGAN parts).

Both trainers here publish per-epoch deltas as flax-msgpack pytrees
(``finetune.py`` -> ``epoch{N}_{encoder,decoder}_delta.msgpack``,
``finetune_mimi.py`` -> ``epoch{N}_{part}_delta.msgpack``). This CLI patches
any number of them into a base checkpoint:

    python tools/apply_deltas.py \
        --base mimi_params.msgpack \
        --delta out/epoch9_decoder_delta.msgpack=decoder \
        --delta out/epoch9_encoder_delta.msgpack=encoder \
        --output mimi_finetuned.msgpack

Each ``--delta`` is ``PATH[=SUBTREE]``: without ``=SUBTREE`` the delta must
match the whole base tree; with it, the delta is anchored at that
dot-separated key path inside the base (the per-part artifact case).
Unlike the reference (which needs the original *model object* and HF
downloads), this operates on serialized pytrees directly — no model code,
no network.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _restore(path: str):
    import flax.serialization

    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def _add_at(base, delta, keypath: str):
    """Return ``base`` with ``delta`` added at the subtree named by keypath."""
    import jax

    if not keypath:
        return jax.tree.map(lambda a, d: np.asarray(a) + np.asarray(d), base, delta)
    head, _, rest = keypath.partition(".")
    if not isinstance(base, dict) or head not in base:
        raise KeyError(
            f"subtree {head!r} not found in base checkpoint "
            f"(top-level keys: {sorted(base) if isinstance(base, dict) else type(base)})"
        )
    out = dict(base)
    out[head] = _add_at(base[head], delta, rest)
    return out


def apply_deltas(base_path: str, delta_specs, output_path: str) -> dict:
    """Load base, apply each ``(path, subtree)`` delta in order, save."""
    import flax.serialization

    tree = _restore(base_path)
    for path, subtree in delta_specs:
        delta = _restore(path)
        tree = _add_at(tree, delta, subtree)
        n = len(jax_leaves(delta))
        print(f"applied {n} delta leaves from {path}"
              + (f" at {subtree!r}" if subtree else ""))
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    with open(output_path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(_np_tree(tree)))
    print(f"reconstructed checkpoint saved at: {output_path}")
    return tree


def jax_leaves(tree):
    import jax

    return jax.tree.leaves(tree)


def _np_tree(tree):
    import jax

    return jax.tree.map(np.asarray, tree)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--base", required=True, help="base checkpoint (.msgpack pytree)")
    ap.add_argument(
        "--delta", action="append", required=True, metavar="PATH[=SUBTREE]",
        help="delta file, optionally anchored at a dot-separated subtree of base; repeatable",
    )
    ap.add_argument("--output", required=True, help="output path (.msgpack)")
    args = ap.parse_args(argv)

    specs = []
    for spec in args.delta:
        path, _, subtree = spec.partition("=")
        if not os.path.exists(path):
            raise FileNotFoundError(f"delta checkpoint not found: {path}")
        specs.append((path, subtree))
    if not os.path.exists(args.base):
        raise FileNotFoundError(f"base checkpoint not found: {args.base}")
    apply_deltas(args.base, specs, args.output)


if __name__ == "__main__":
    main()
