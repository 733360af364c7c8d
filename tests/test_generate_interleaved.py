"""`generate.py --interleaved` end-to-end on the tiny Chameleon.

Covers the interleaved CLI surface (reference
``wmar/models/chameleon_wrapper.py:108-134``): prompts file in, per-prompt
result tree out with text segments and watermarked image segments carrying
raw + roundtrip detection p-values.
"""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import generate  # noqa: E402


@pytest.mark.slow
def test_interleaved_cli_tree(tmp_path):
    prompts = tmp_path / "prompts.txt"
    prompts.write_text("a red bird\n")
    outdir = tmp_path / "out"

    records = []
    for seed in range(12):  # boi emission is stochastic in a random model
        records = generate.main([
            "--model", "chameleon7b", "--tiny",
            "--interleaved", str(prompts),
            "--num_samples_per_conditioning", "1",
            "--outdir", str(outdir / f"s{seed}"),
            "--wm_method", "gentime", "--text_gen_len", "16",
            "--top_p", "1.0", "--seed", str(seed),
        ])
        if records:
            outdir = outdir / f"s{seed}"
            break
    assert records, "no image segment generated in 12 seeds"

    d = outdir / "p=0,idx=0"
    assert (d / "prompt.txt").read_text().strip() == "a red bird"
    imgs = sorted(d.glob("seg*_img.png"))
    assert imgs, os.listdir(d)
    k = imgs[0].stem  # seg<k>_img
    rec = json.loads((d / f"{k}.json").read_text())
    assert 0.0 <= rec["pvalue_raw"] <= 1.0
    assert 0.0 <= rec["pvalue_roundtrip"] <= 1.0
    codes = np.load(d / f"{k}.npy")
    assert codes.ndim == 2 and codes.shape[1] > 0
    # a text segment precedes the image segment
    assert sorted(d.glob("seg*_text.txt")), os.listdir(d)


def test_interleaved_assets_mirrored():
    """The reference's interleaved/coco/class-index assets have repo
    counterparts (published data constants, required for parity)."""
    assets = os.path.join(REPO, "assets")
    with open(os.path.join(assets, "interleaved_prompts.txt")) as f:
        lines = [ln for ln in f if ln.strip()]
    assert len(lines) == 1000 and lines[0].strip() == "tench"
    with open(os.path.join(assets, "coco_prompts_5k.txt")) as f:
        assert len(f.readlines()) == 5000
    with open(os.path.join(assets, "imagenet_class_index.json")) as f:
        idx = json.load(f)
    assert idx["0"][1] == "tench" and len(idx) == 1000
