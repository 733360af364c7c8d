"""End-to-end generate.py smoke test (tiny model, full pipeline)."""

import json
import os

import numpy as np
import pytest


pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"

def test_generate_cli_tiny_taming(tmp_path):
    import generate

    records = generate.main([
        "--outdir", str(tmp_path),
        "--model", "taming",
        "--tiny",
        "--conditioning", "3,5",
        "--num_samples_per_conditioning", "1",
        "--batch_size", "2",
        "--top_k", "40",
        "--top_p", "0.95",
        "--wm_method", "gentime",
        "--wm_seed_strategy", "linear",
        "--wm_split_strategy", "rand",
        "--wm_context_size", "1",
        "--wm_delta", "8.0",
        "--wm_gamma", "0.25",
        "--max_roundtrips", "1",
        "--no_augs",
    ])
    # 2 transforms rows (roundtrips 0 and 1) x 2 samples
    assert len(records) == 4
    # Original (T=0) records must detect strongly.
    orig = [r for r in records if r["transform"] == "roundtrips" and r["param"] == 0]
    assert all(r["pvalue"] < 1e-2 for r in orig), orig
    assert all(r["l0"] == 0.0 for r in orig)

    # Result tree in the reference layout
    d = tmp_path / "c=3,idx=1"
    assert (d / "0001_linear-rand-h=1-d=8.0-g=0.25_roundtrips_0.json").exists()
    assert (d / "0001_linear-rand-h=1-d=8.0-g=0.25_roundtrips_0.npy").exists()
    assert (d / "0001_linear-rand-h=1-d=8.0-g=0.25_roundtrips_0.png").exists()
    codes = np.load(d / "0001_linear-rand-h=1-d=8.0-g=0.25_roundtrips_0.npy")
    assert codes.shape == (256,)
    metrics = json.loads((d / "0001_linear-rand-h=1-d=8.0-g=0.25_roundtrips_0.json").read_text())
    assert set(metrics) == {"pvalue", "l0", "psnr"}


def test_generate_cli_tiny_rar_with_augs(tmp_path):
    import generate

    records = generate.main([
        "--outdir", str(tmp_path),
        "--model", "rar",
        "--tiny",
        "--conditioning", "1",
        "--num_samples_per_conditioning", "2",
        "--batch_size", "2",
        "--top_k", "0",
        "--top_p", "1.0",
        "--wm_method", "gentime",
        "--wm_seed_strategy", "linear",
        "--wm_split_strategy", "rand",
        "--wm_context_size", "1",
        "--wm_delta", "6.0",
        "--wm_gamma", "0.25",
        "--max_roundtrips", "1",
    ])
    transforms = {r["transform"] for r in records}
    # all seven classic attacks present + roundtrips
    assert transforms == {
        "roundtrips", "gaussian-blur", "gaussian-noise", "jpeg", "brightness",
        "rotation", "flip-h", "upperleft-crop",
    }
    for r in records:
        assert 0.0 <= r["pvalue"] <= 1.0
        assert 0.0 <= r["l0"] <= 1.0


def test_generate_cli_tiny_rar_int8_weights(tmp_path):
    """--weight_dtype int8 runs the full pipeline and originals still detect."""
    import generate

    records = generate.main([
        "--outdir", str(tmp_path),
        "--model", "rar",
        "--tiny",
        "--weight_dtype", "int8",
        "--conditioning", "1",
        "--num_samples_per_conditioning", "2",
        "--batch_size", "2",
        "--top_k", "0",
        "--top_p", "1.0",
        "--wm_method", "gentime",
        "--wm_seed_strategy", "linear",
        "--wm_split_strategy", "rand",
        "--wm_context_size", "1",
        "--wm_delta", "6.0",
        "--wm_gamma", "0.25",
        "--max_roundtrips", "1",
        "--no_augs",
    ])
    orig = [r for r in records if r["transform"] == "roundtrips" and r["param"] == 0]
    assert orig and all(r["pvalue"] < 1e-2 for r in orig), orig


def test_chunking_covers_all_batches(tmp_path):
    """Two chunks together cover exactly the full record set once."""
    import generate

    common = [
        "--model", "taming", "--tiny",
        "--conditioning", "1,2,3,4",
        "--num_samples_per_conditioning", "1",
        "--batch_size", "2",
        "--wm_method", "gentime",
        "--wm_delta", "4.0", "--wm_gamma", "0.25",
        "--wm_seed_strategy", "linear", "--wm_split_strategy", "rand",
        "--wm_context_size", "1",
        "--max_roundtrips", "0", "--no_augs",
        "--num_chunks", "2",
    ]
    r0 = generate.main(["--outdir", str(tmp_path / "c0"), "--chunk_id", "0"] + common)
    r1 = generate.main(["--outdir", str(tmp_path / "c1"), "--chunk_id", "1"] + common)
    keys0 = {(r["conditioning"], r["idx"]) for r in r0}
    keys1 = {(r["conditioning"], r["idx"]) for r in r1}
    assert keys0 | keys1 == {(1, 1), (2, 1), (3, 1), (4, 1)}
    assert not (keys0 & keys1)


def test_generate_cli_torch_compat_tables(tmp_path):
    """The torch-parity greenlist table path works end-to-end."""
    import generate

    records = generate.main([
        "--outdir", str(tmp_path),
        "--model", "taming",
        "--tiny",
        "--conditioning", "3",
        "--num_samples_per_conditioning", "2",
        "--batch_size", "2",
        "--wm_method", "gentime",
        "--wm_seed_strategy", "linear",
        "--wm_split_strategy", "rand",
        "--wm_context_size", "1",
        "--wm_delta", "8.0",
        "--wm_gamma", "0.25",
        "--wm_torch_compat", "true",
        "--max_roundtrips", "0",
        "--no_augs",
    ])
    orig = [r for r in records if r["transform"] == "roundtrips" and r["param"] == 0]
    assert all(r["pvalue"] < 1e-2 for r in orig), orig


def test_generate_cli_orig_only_layout(tmp_path):
    """orig_only writes the reference's flat FID layout (images/ + codes/)."""
    import generate

    generate.main([
        "--outdir", str(tmp_path),
        "--model", "taming", "--tiny",
        "--conditioning", "3",
        "--num_samples_per_conditioning", "1",
        "--batch_size", "1",
        "--wm_method", "gentime", "--wm_seed_strategy", "linear",
        "--wm_split_strategy", "rand", "--wm_context_size", "1",
        "--wm_delta", "4.0", "--wm_gamma", "0.25",
        "--orig_only", "true", "--max_roundtrips", "0",
    ])
    assert (tmp_path / "images" / "3:0001.png").exists()
    assert (tmp_path / "codes" / "3:0001.npy").exists()


def test_generate_cli_with_syncseal(tmp_path):
    """--sync with a saved SyncSeal checkpoint runs the full synced pipeline."""
    import jax

    import generate
    from wmar_tpu.sync.syncseal import SyncSealConfig, SyncSealModel

    model = SyncSealModel.init(jax.random.PRNGKey(0), SyncSealConfig(image_size=32))
    sync_path = str(tmp_path / "syncmodel.msgpack")
    model.save(sync_path)

    records = generate.main([
        "--outdir", str(tmp_path / "out"),
        "--model", "taming", "--tiny",
        "--conditioning", "3",
        "--num_samples_per_conditioning", "1",
        "--batch_size", "1",
        "--wm_method", "gentime", "--wm_seed_strategy", "linear",
        "--wm_split_strategy", "rand", "--wm_context_size", "1",
        "--wm_delta", "8.0", "--wm_gamma", "0.25",
        "--max_roundtrips", "1", "--no_augs",
        "--sync", "true", "--syncpath", sync_path,
    ])
    assert records
    for r in records:
        assert 0.0 <= r["pvalue"] <= 1.0
