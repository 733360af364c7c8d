"""tools/apply_deltas.py: base + delta -> reconstructed checkpoint.

Mirrors the reference's standalone delta reconstruction
(``wmar_audio/training/apply_deltas.py:1-124``): per-part deltas are patched
into a base checkpoint additively; keys without a delta stay at base values.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.apply_deltas import apply_deltas, main  # noqa: E402
from wmar_tpu.utils import checkpoint as ckpt  # noqa: E402


def _trees():
    base = {
        "encoder": {"w": np.ones((3, 2), np.float32), "b": np.zeros((2,), np.float32)},
        "decoder": {"w": np.full((2, 2), 2.0, np.float32)},
    }
    finetuned_dec = {"w": np.full((2, 2), 2.5, np.float32)}
    return base, finetuned_dec


def test_subtree_delta_roundtrip(tmp_path):
    base, ft_dec = _trees()
    bp = str(tmp_path / "base.msgpack")
    dp = str(tmp_path / "dec_delta.msgpack")
    op = str(tmp_path / "out.msgpack")
    ckpt.save_pytree(bp, base)
    ckpt.save_delta(dp, ft_dec, base["decoder"])

    out = apply_deltas(bp, [(dp, "decoder")], op)
    np.testing.assert_allclose(out["decoder"]["w"], ft_dec["w"])
    # untouched part stays at base values
    np.testing.assert_allclose(out["encoder"]["w"], base["encoder"]["w"])
    # and the saved artifact round-trips
    reloaded = ckpt.load_pytree(op, out)
    np.testing.assert_allclose(reloaded["decoder"]["w"], ft_dec["w"])


def test_whole_tree_delta_and_cli(tmp_path):
    base, _ = _trees()
    new = {
        "encoder": {"w": base["encoder"]["w"] + 1, "b": base["encoder"]["b"] - 1},
        "decoder": {"w": base["decoder"]["w"] * 3},
    }
    bp = str(tmp_path / "base.msgpack")
    dp = str(tmp_path / "delta.msgpack")
    op = str(tmp_path / "out.msgpack")
    ckpt.save_pytree(bp, base)
    ckpt.save_delta(dp, new, base)

    main(["--base", bp, "--delta", dp, "--output", op])
    out = ckpt.load_pytree(op, base)
    np.testing.assert_allclose(out["decoder"]["w"], new["decoder"]["w"])
    np.testing.assert_allclose(out["encoder"]["b"], new["encoder"]["b"])


def test_bad_subtree_errors(tmp_path):
    base, ft_dec = _trees()
    bp = str(tmp_path / "base.msgpack")
    dp = str(tmp_path / "d.msgpack")
    ckpt.save_pytree(bp, base)
    ckpt.save_delta(dp, ft_dec, base["decoder"])
    try:
        apply_deltas(bp, [(dp, "nonexistent")], str(tmp_path / "o.msgpack"))
    except KeyError as e:
        assert "nonexistent" in str(e)
    else:
        raise AssertionError("expected KeyError for a bad subtree anchor")
