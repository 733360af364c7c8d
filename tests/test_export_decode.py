"""StableHLO deployment export of the watermarked generation pipeline:
export + deserialize + bit-exact round-trip (tools/export_decode.py
--self_test does the comparisons; this locks the tool end to end)."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


import pytest

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"

def test_export_decode_roundtrip(tmp_path):
    from tools.export_decode import main

    main([
        "--tiny", "--model", "rar",
        "--outdir", str(tmp_path),
        "--batch", "2",
        "--wm_delta", "8.0",
        "--self_test",
    ])
    for name in ("sample", "decode", "detect"):
        path = tmp_path / f"rar_{name}.stablehlo"
        assert path.exists() and path.stat().st_size > 0
