"""generate.py --dp: data-parallel batch sharding from the CLI must be
token- and metric-identical to the single-device run.

The mesh mechanism itself is covered by tests/test_parallel.py; this locks
the entry-point plumbing (padding to the dp size, trimming, records)."""

import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pytest

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"

ARGV = [
    "--tiny", "--model", "rar",
    "--conditioning", "0,1,2",
    "--num_samples_per_conditioning", "1",
    "--batch_size", "3",  # not a multiple of dp: exercises the pad+trim path
    "--wm_method", "gentime",
    "--wm_delta", "4.0",
    "--seed", "7",
    "--no_augs",
]


def _collect(outdir):
    recs = {}
    for path in sorted(glob.glob(os.path.join(outdir, "c=*", "*.json"))):
        rec = json.load(open(path))
        recs[os.path.relpath(path, outdir)] = (rec["pvalue"], rec["l0"])
    codes = {
        os.path.relpath(p, outdir): np.load(p).ravel().tolist()
        for p in sorted(glob.glob(os.path.join(outdir, "c=*", "*.npy")))
    }
    assert recs and codes
    return recs, codes


def test_dp_cli_matches_single_device(tmp_path):
    import generate

    generate.main(ARGV + ["--outdir", str(tmp_path / "dp1"), "--dp", "1"])
    generate.main(ARGV + ["--outdir", str(tmp_path / "dp2"), "--dp", "2"])
    recs1, codes1 = _collect(str(tmp_path / "dp1"))
    recs2, codes2 = _collect(str(tmp_path / "dp2"))
    assert codes1 == codes2
    for rel, (p1, l1) in recs1.items():
        p2, l2 = recs2[rel]
        assert l1 == l2
        assert np.isclose(p1, p2, rtol=1e-6)


def test_dp_cli_packed_cache_matches_single_device(tmp_path):
    """--dp 2 with the packed int8 cache: the CacheSpec plumbing hands the
    mesh to the cache, decode attention runs the Pallas kernel per-shard
    under shard_map, and tokens must still be identical to --dp 1 (whose
    single-device kernel does the same per-row math)."""
    import generate

    argv = ARGV + ["--cache_dtype", "packed"]
    generate.main(argv + ["--outdir", str(tmp_path / "dp1"), "--dp", "1"])
    generate.main(argv + ["--outdir", str(tmp_path / "dp2"), "--dp", "2"])
    recs1, codes1 = _collect(str(tmp_path / "dp1"))
    recs2, codes2 = _collect(str(tmp_path / "dp2"))
    assert codes1 == codes2
    for rel, (p1, l1) in recs1.items():
        p2, l2 = recs2[rel]
        assert l1 == l2
        assert np.isclose(p1, p2, rtol=1e-6)


def test_tp_cli_packed_cache_chameleon(tmp_path):
    """--tp 2 with the packed cache on the tiny chameleon t2i path: the
    grouped (tp_groups=2) lane layout must reproduce the replicated plain
    packed run token-for-token."""
    import generate

    prompts = tmp_path / "prompts.txt"
    prompts.write_text("a red car\nthe sea\n")
    argv = [
        "--tiny", "--model", "chameleon7b",
        "--conditioning", str(prompts),
        "--num_samples_per_conditioning", "1",
        "--batch_size", "2",
        "--wm_method", "gentime", "--wm_delta", "4.0",
        "--seed", "7", "--no_augs",
        "--cache_dtype", "packed",
    ]
    generate.main(argv + ["--outdir", str(tmp_path / "tp1")])
    generate.main(argv + ["--outdir", str(tmp_path / "tp2"), "--tp", "2"])
    recs1, codes1 = _collect(str(tmp_path / "tp1"))
    recs2, codes2 = _collect(str(tmp_path / "tp2"))
    assert codes1 == codes2
    for rel, (p1, l1) in recs1.items():
        p2, l2 = recs2[rel]
        assert l1 == l2
        assert np.isclose(p1, p2, rtol=1e-6)


def test_tp_cli_chameleon_matches_single_device(tmp_path):
    """--tp 2 (megatron param sharding from the CLI) == replicated run,
    through the tiny chameleon t2i path with text-prompt conditionings."""
    import generate

    prompts = tmp_path / "prompts.txt"
    prompts.write_text("a red car\nthe sea\n")
    argv = [
        "--tiny", "--model", "chameleon7b",
        "--conditioning", str(prompts),
        "--num_samples_per_conditioning", "1",
        "--batch_size", "2",
        "--wm_method", "gentime", "--wm_delta", "4.0",
        "--seed", "7", "--no_augs",
    ]
    generate.main(argv + ["--outdir", str(tmp_path / "tp1")])
    generate.main(argv + ["--outdir", str(tmp_path / "tp2"), "--tp", "2"])
    recs1, codes1 = _collect(str(tmp_path / "tp1"))
    recs2, codes2 = _collect(str(tmp_path / "tp2"))
    assert codes1 == codes2
    for rel, (p1, l1) in recs1.items():
        p2, l2 = recs2[rel]
        assert l1 == l2
        assert np.isclose(p1, p2, rtol=1e-6)


def test_sp_cli_chameleon_matches_single_device(tmp_path):
    """--sp 2 --tp 2 (ring-attention prompt prefill + megatron sharding from
    the CLI) == replicated run on the tiny chameleon t2i path. The prompts
    are left-padded to the ring size; start offsets absorb the shift, so
    codes must be identical."""
    import generate

    prompts = tmp_path / "prompts.txt"
    prompts.write_text("a red car\nthe sea\n")
    argv = [
        "--tiny", "--model", "chameleon7b",
        "--conditioning", str(prompts),
        "--num_samples_per_conditioning", "1",
        "--batch_size", "2",
        "--wm_method", "gentime", "--wm_delta", "4.0",
        "--seed", "7", "--no_augs",
    ]
    generate.main(argv + ["--outdir", str(tmp_path / "sp1")])
    generate.main(argv + ["--outdir", str(tmp_path / "sp2"),
                          "--sp", "2", "--tp", "2"])
    recs1, codes1 = _collect(str(tmp_path / "sp1"))
    recs2, codes2 = _collect(str(tmp_path / "sp2"))
    assert codes1 == codes2
    for rel, (p1, l1) in recs1.items():
        p2, l2 = recs2[rel]
        assert l1 == l2
        assert np.isclose(p1, p2, rtol=1e-6)


def test_pp_cli_chameleon_matches_single_device(tmp_path):
    """--pp 2 (GPipe prefill from the CLI) == replicated run on the tiny
    chameleon t2i path (2 layers -> 2 stages; the 6 CFG rows stream through
    the stage ring as microbatches)."""
    import generate

    prompts = tmp_path / "prompts.txt"
    prompts.write_text("a red car\nthe sea\n")
    argv = [
        "--tiny", "--model", "chameleon7b",
        "--conditioning", str(prompts),
        "--num_samples_per_conditioning", "1",
        "--batch_size", "2",
        "--wm_method", "gentime", "--wm_delta", "4.0",
        "--seed", "7", "--no_augs",
    ]
    generate.main(argv + ["--outdir", str(tmp_path / "pp1")])
    generate.main(argv + ["--outdir", str(tmp_path / "pp2"), "--pp", "2"])
    recs1, codes1 = _collect(str(tmp_path / "pp1"))
    recs2, codes2 = _collect(str(tmp_path / "pp2"))
    assert codes1 == codes2
    for rel, (p1, l1) in recs1.items():
        p2, l2 = recs2[rel]
        assert l1 == l2
        assert np.isclose(p1, p2, rtol=1e-6)
