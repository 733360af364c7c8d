"""Watermark-under-sync eval + baseline bank.

Covers the rebuild of ``syncseal/syncseal/evals/eval_wm.py:1-402`` and
``evals/baselines.py:391-639``: the EmbedderExtractor wrapper contract, the
hermetic spread-spectrum baseline, grid CSV output, and that sync-based
geometric inversion actually recovers watermark bits.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.sync.baselines import (
    EmbedderExtractor,
    bit_accuracy,
    build_baseline,
    pvalue,
)
from wmar_tpu.sync.eval_wm import (
    _synthetic_images,
    evaluate_watermark_with_sync,
    geom_endpoints,
    grouped_summary,
    load_sync,
    valuemetric_grid,
)

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"


def test_metrics_bit_accuracy_and_pvalue():
    targets = jnp.asarray([[1, 0, 1, 1, 0, 0, 1, 0]] * 2)
    perfect = 2.0 * targets.astype(jnp.float32) - 1.0
    accs = bit_accuracy(perfect, targets)
    np.testing.assert_allclose(np.asarray(accs), 1.0)
    pv = pvalue(perfect, targets)
    assert (pv < 0.01).all()  # 8/8 bits: p = 2^-8
    chance = -perfect  # every bit wrong
    assert float(bit_accuracy(chance, targets).mean()) == 0.0
    assert (pvalue(chance, targets) > 0.99).all()


def test_spread_spectrum_embed_detect_roundtrip():
    b = build_baseline("ss", img_size=64, seed=3)
    imgs = _synthetic_images(3, 64, seed=1)
    msgs = b.get_random_msg(jax.random.PRNGKey(0), 3)
    out = b.embed(imgs, msgs)
    # imperceptibility contract: ~30 dB PSNR at the default amplitude
    mse = float(jnp.mean((out["imgs_w"] - imgs) ** 2))
    assert 10 * np.log10(1.0 / mse) > 25.0
    det = b.detect(out["imgs_w"])
    assert det["preds"].shape == (3, 1 + 48)
    acc = float(bit_accuracy(det["preds"][:, 1:], msgs).mean())
    assert acc > 0.95


def test_registry_stubs_and_guards():
    # hidden is a real port since round 5 (sync/hidden.py): without the
    # reference's TorchScript weights it refuses random weights like wam
    for m in ("mbrs", "cin", "trustmark", "videoseal"):
        with pytest.raises(NotImplementedError):
            build_baseline(m)
    for m in ("hidden", "wam"):
        with pytest.raises(ValueError):
            build_baseline(m)  # random weights refused without allow_random
    with pytest.raises(ValueError):
        build_baseline("nope")


def test_geom_endpoints_families():
    rng = np.random.default_rng(0)
    ident = geom_endpoints("identity", 0, rng, 2)
    assert ident.shape == (2, 4, 2)
    flip = geom_endpoints("hflip", 0, rng, 1)
    np.testing.assert_allclose(flip[0, :, 0], 1.0 - ident[0, :, 0])
    rot90 = geom_endpoints("rotate", 90, rng, 1)
    # 90-degree rotation about the center maps TL onto TR's position
    np.testing.assert_allclose(rot90[0, 0], ident[0, 1], atol=1e-6)
    crop = geom_endpoints("crop", 0.25, rng, 1)  # area 1/4 -> linear 1/2
    np.testing.assert_allclose(crop[0, 0], [-0.5, -0.5], atol=1e-6)
    tl = geom_endpoints("crop", 0.25, rng, 1, topleft_crop=True)
    np.testing.assert_allclose(tl[0, 0], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(tl[0, 2], [2.0, 2.0], atol=1e-6)
    persp = geom_endpoints("perspective", 0.4, rng, 4)
    assert not np.allclose(persp, ident[:1])  # corners jittered inward
    assert np.abs(persp - np.tile(ident[:1], (4, 1, 1))).max() <= 0.2 + 1e-6


def test_valuemetric_grid_matches_reference_rows():
    names = [n for n, _, _ in valuemetric_grid()]
    assert names == ["identity", "brightness", "contrast", "hue",
                     "grayscale", "jpeg", "gaussian_blur", "jpeg+brightness"]
    assert [n for n, _, _ in valuemetric_grid(only_identity=True)] == ["identity"]


def test_eval_wm_sift_recovers_geometry(tmp_path):
    """End-to-end: without sync, rotation kills the watermark; SIFT corner
    inversion recovers it (the pipeline the reference's eval_wm measures)."""
    baseline = build_baseline("ss", img_size=64, seed=0)
    imgs = _synthetic_images(2, 64, seed=0)
    geoms = {"identity": [0], "rotate": [10]}

    rows_none = evaluate_watermark_with_sync(
        baseline, None, imgs, str(tmp_path / "none"), only_identity=True,
        geoms=geoms)
    rows_sift = evaluate_watermark_with_sync(
        baseline, load_sync("sift"), imgs, str(tmp_path / "sift"),
        only_identity=True, geoms=geoms)

    def cell(rows, g):
        return next(r for r in rows if r["geom_aug"] == g)

    assert cell(rows_none, "identity_0")["bit_accuracy"] > 0.9
    assert np.isnan(cell(rows_none, "identity_0")["corner_error"])
    broken = cell(rows_none, "rotate_10")["bit_accuracy"]
    fixed = cell(rows_sift, "rotate_10")["bit_accuracy"]
    assert broken < 0.7
    assert fixed > broken + 0.1
    # SIFT nails identity geometry to sub-pixel corner error
    assert cell(rows_sift, "identity_0")["corner_error"] < 2.0

    csv = tmp_path / "sift" / "watermark_sync_metrics.csv"
    assert csv.exists()
    header = csv.read_text().splitlines()[0]
    assert header.split(",")[:8] == [
        "index", "geom_aug", "geom_strength", "val_aug", "val_strength",
        "bit_accuracy", "log_pvalue", "corner_error"]
    summary = grouped_summary(rows_sift)
    assert summary.splitlines()[-1].startswith("all,all,")


def test_eval_wm_syncseal_and_wam_smoke(tmp_path):
    """Random-init SyncSeal / WAM sync models drive the same pipeline
    (corner quality is meaningless untrained; shape/flow is the contract)."""
    baseline = build_baseline("ss", img_size=64, seed=0)
    imgs = _synthetic_images(1, 64, seed=2)
    sync = load_sync("syncseal", tiny=True)
    rows = evaluate_watermark_with_sync(
        baseline, sync, imgs, str(tmp_path / "ssl"), only_identity=True,
        geoms={"identity": [0]})
    assert len(rows) == 1 and np.isfinite(rows[0]["corner_error"])
