"""Analyzer: record loading, token-match stats, robustness tables."""

import json
import os

import numpy as np

from wmar_tpu.eval.analyzer import (
    full_attack_grid,
    load_records,
    markdown_table,
    records_from_list,
    robustness_table,
    token_match_stats,
    tpr_at_fpr,
)


def make_records():
    recs = []
    # 10 watermarked samples: strong detection unattacked, weak under blur
    for i in range(10):
        recs.append(dict(conditioning=1, idx=i, method="m", transform="roundtrips",
                         param=0, pvalue=1e-8, l0=0.0, psnr=99.0))
        recs.append(dict(conditioning=1, idx=i, method="m", transform="roundtrips",
                         param=1, pvalue=1e-6, l0=0.05, psnr=30.0))
        recs.append(dict(conditioning=1, idx=i, method="m", transform="gaussian-blur",
                         param=9, pvalue=0.5 if i < 5 else 1e-4, l0=0.4, psnr=25.0))
        recs.append(dict(conditioning=1, idx=i, method="m", transform="rotation",
                         param=10, pvalue=0.9, l0=0.8, psnr=20.0))
    return records_from_list(recs)


def test_tpr_at_fpr():
    assert tpr_at_fpr(np.array([0.001, 0.5, 0.002, 0.9])) == 0.5


def test_token_match_stats():
    recs = make_records()
    s = token_match_stats(recs, roundtrip=1)
    assert abs(s["mean"] - 0.95) < 1e-9 and s["n"] == 10
    assert s["frac_above_0.8"] == 1.0


def test_robustness_table_categories():
    recs = make_records()
    t = robustness_table(recs)
    assert t["per_attack"]["None"] == 1.0
    assert t["per_attack"]["gaussian-blur"] == 0.5
    assert t["per_attack"]["rotation"] == 0.0
    assert t["per_category"]["Valuemetric"] == 0.5
    assert t["per_category"]["Geometric"] == 0.0
    md = markdown_table(t)
    assert "Valuemetric" in md and "0.50" in md


def test_full_grid():
    grid = full_attack_grid(make_records())
    assert grid["gaussian-blur"]["9"]["n"] == 10
    assert grid["roundtrips"]["0"]["tpr"] == 1.0


def test_load_records_from_tree(tmp_path):
    d = tmp_path / "c=3,idx=1"
    os.makedirs(d)
    (d / "0001_linear-rand-h=1-d=8.0-g=0.25_jpeg_25.json").write_text(
        json.dumps({"pvalue": 0.001, "l0": 0.1, "psnr": 33.0})
    )
    recs = load_records(str(tmp_path))
    assert len(recs) == 1
    r = recs[0]
    assert r.conditioning == "3" and r.idx == 1
    assert r.method == "linear-rand-h=1-d=8.0-g=0.25"
    assert r.transform == "jpeg" and r.param == "25"
    assert r.metrics["pvalue"] == 0.001


def test_roc_points():
    from wmar_tpu.eval.analyzer import roc_points

    wm = [1e-6] * 90 + [0.5] * 10
    null = list(np.linspace(0.01, 1.0, 100))
    fpr, tpr, auc = roc_points(wm, null)
    assert 0.9 <= auc <= 1.0
    assert tpr[0] <= tpr[-1] and fpr[-1] == 1.0


def test_cached_parallel_walk(tmp_path):
    """load_records caches; a second call with unchanged tree hits the cache
    and returns identical records."""
    import json as _json
    import os as _os

    from wmar_tpu.eval.analyzer import load_records

    d = tmp_path / "c=0,idx=1"
    d.mkdir()
    for i, name in enumerate(["0001_m_roundtrips_0.json", "0001_m_jpeg_25.json"]):
        with open(d / name, "w") as f:
            _json.dump({"pvalue": 0.001 * (i + 1), "l0": 0.1}, f)
    recs1 = load_records(str(tmp_path))
    assert _os.path.exists(tmp_path / ".analyzer_cache.json")
    recs2 = load_records(str(tmp_path))
    assert [r.__dict__ for r in recs1] == [r.__dict__ for r in recs2]
    assert len(recs1) == 2


def test_write_report_end_to_end(tmp_path):
    import json as _json

    import numpy as np

    from wmar_tpu.eval.analyzer import write_report

    rng = np.random.default_rng(0)
    for idx in range(1, 9):
        d = tmp_path / f"c=0,idx={idx}"
        d.mkdir()
        rows = {
            f"{idx:04}_wm_roundtrips_0.json": {"pvalue": float(rng.uniform(0, 1e-4)), "l0": 0.05},
            f"{idx:04}_wm_roundtrips_1.json": {"pvalue": float(rng.uniform(0, 1e-3)), "l0": 0.1},
            f"{idx:04}_wm_jpeg_25.json": {"pvalue": float(rng.uniform(0, 0.2)), "l0": 0.3},
            f"{idx:04}_wm_neural-compress_bmshj2018-factorized-q=3.json": {
                "pvalue": float(rng.uniform(0, 0.3)), "l0": 0.4, "bpp": 0.5 + 0.01 * idx},
            f"{idx:04}_wm_neural-compress_bmshj2018-factorized-q=6.json": {
                "pvalue": float(rng.uniform(0, 0.1)), "l0": 0.2, "bpp": 1.2},
        }
        for name, metrics in rows.items():
            with open(d / name, "w") as f:
                _json.dump(metrics, f)
    path = write_report(str(tmp_path))
    report = open(path).read()
    assert "TPR@1%FPR" in report and "tabular" in report
    import os as _os

    rd = _os.path.dirname(path)
    for fig in ["roc.png", "token_match_hist.png", "robustness.png", "tpr_vs_bpp.png"]:
        assert _os.path.exists(_os.path.join(rd, fig)), fig


def test_rescore_matches_stored_pvalues(tmp_path, rng):
    """analyzer.rescore: saved .npy codes -> pvalues through the native
    scorer must reproduce the generation-time records (VERDICT r2 #6)."""
    import json as _json

    import jax.numpy as jnp

    from wmar_tpu.core import HashGreenlist, WatermarkSpec
    from wmar_tpu.core.detect import detect
    from wmar_tpu.eval.analyzer import rescore

    method = "linear-stratifiedrand-h=1-d=2.0-g=0.25"
    spec = WatermarkSpec.from_string(method, vocab_size=64)
    gl = HashGreenlist(spec)
    d = tmp_path / "c=0,idx=1"
    d.mkdir()
    codes = rng.integers(0, 64, size=(3, 64)).astype(np.int32)
    pv = np.asarray(detect(spec, gl, jnp.asarray(codes)))
    for i in range(3):
        stem = f"{1:04}_{method}_jpeg_{50 + i}"
        np.save(d / f"{stem}.npy", codes[i])
        with open(d / f"{stem}.json", "w") as f:
            _json.dump({"pvalue": float(pv[i]), "l0": 0.1}, f)
    out = rescore(str(tmp_path), vocab_size=64)
    assert len(out) == 3
    got = np.array([out[f"c=0,idx=1/{1:04}_{method}_jpeg_{50 + i}.npy"] for i in range(3)])
    np.testing.assert_allclose(got, pv, atol=1e-4)
