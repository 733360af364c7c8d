"""End-to-end reproduction of the paper's RCC mechanism (tools/repro_tiny.py).

Locks the Base-vs-FT-vs-FT+Augs direction of BASELINE.md's table
(token match 0.659 -> 0.956; TPR under trained attacks) as a seeded
regression: pretrain a tiny tokenizer to the reference's base roundtrip
level, watermark-generate through the real sampling stack, RCC-finetune
with the real training stack, and verify detection improves.

Measured at this budget/seed (2026-08, CPU):
  clean match   base 0.677 -> ft 0.826      (reference: 0.659 -> 0.956)
  crop-pad 0.6  match 0.064 -> 0.243, TPR 0.00 -> 0.94   (ft_aug)
  rotation 3    TPR 0.44 -> 0.88 (ft)
  noise 0.1     match 0.289 -> 0.343, TPR 0.125 -> 0.31  (ft_aug)
jpeg at 32px is pixel-starved (one 8x8 DCT block spans 16 latent cells) and
does not train — reported, not asserted; crop-RESIZE misaligns the token
grid entirely, which is exactly the cell the paper adds synchronization for.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

pytestmark = pytest.mark.slow  # ~15 min CPU: the paper-mechanism e2e


@pytest.fixture(scope="module")
def results():
    from repro_tiny import FAST_BUDGET, run

    return run(FAST_BUDGET, seed=0, out=None, log=lambda *a, **k: None)


def test_null_fpr_controlled(results):
    for method, cells in results.items():
        for cell, r in cells.items():
            assert r["fpr_null"] <= 0.15, (method, cell, r)


def test_clean_detection_perfect_everywhere(results):
    for method in ("base", "ft", "ft_aug"):
        assert results[method]["none"]["tpr"] == 1.0


def test_ft_lifts_clean_token_match(results):
    """The 0.659 -> 0.956 direction (BASELINE.md row 1)."""
    base = results["base"]["none"]["token_match"]
    ft = results["ft"]["none"]["token_match"]
    assert 0.55 <= base <= 0.80, base  # pretrained to the reference's level
    assert ft >= base + 0.08, (base, ft)


def test_aug_training_rescues_crop(results):
    """FT+Augs makes detection survive the trained crop (TPR 0 -> ~0.9),
    the direction of BASELINE.md's Geometric row only sync/augs fix."""
    cell = "crop-pad_0.6"
    assert results["base"][cell]["tpr"] <= 0.2
    assert results["ft"][cell]["tpr"] <= 0.3  # no-aug FT does NOT fix crops
    assert results["ft_aug"][cell]["tpr"] >= results["base"][cell]["tpr"] + 0.5
    assert (results["ft_aug"][cell]["token_match"]
            >= results["base"][cell]["token_match"] + 0.08)


def test_aug_training_improves_valuemetric(results):
    """Noise/rotation: trained-aug token match and TPR must not regress and
    must improve on at least one of the two (fast-budget margins)."""
    gains = 0
    for cell in ("gaussian-noise_0.1", "rotation_3"):
        b = results["base"][cell]
        fa = results["ft_aug"][cell]
        assert fa["token_match"] >= b["token_match"] - 0.02, (cell, b, fa)
        assert fa["tpr"] >= b["tpr"] - 0.1, (cell, b, fa)
        if fa["tpr"] >= b["tpr"] + 0.15 or fa["token_match"] >= b["token_match"] + 0.04:
            gains += 1
    assert gains >= 1, results


def test_crop_resize_stays_broken_without_sync(results):
    """Resize-back cropping rescales the token grid — no tokenizer finetune
    can survive it (the reference's motivation for WAM/SyncSeal sync:
    BASELINE.md Geometric row is 0.01 for everything but +Sync)."""
    cell = "crop-resize_0.6"
    for method in ("base", "ft", "ft_aug"):
        assert results[method][cell]["tpr"] <= 0.2


def test_rar_family_mechanism():
    """The RAR/MaskGit twin (round 5): the SAME pipeline through the RAR
    tokenizer family — tiny MaskGit-VQGAN + tiny RAR generator with
    in-batch CFG (the reference's rar_generate.json watermark config) —
    shows the same mechanism directions.

    Measured at this budget/seed (2026-08, CPU):
      clean match    base 0.665 -> ft 0.831
      crop-pad 0.6   TPR 0.000 -> 1.000, match 0.075 -> 0.243 (ft_aug)
      rotation 3     TPR 0.438 -> 0.875 (ft_aug)
      crop-resize    stays 0.0 TPR for all methods (the sync-needed cell)
    """
    from repro_tiny import FAST_BUDGET, run

    r = run(FAST_BUDGET, seed=0, out=None, family="rar",
            log=lambda *a, **k: None)
    base = r["base"]["none"]["token_match"]
    ft = r["ft"]["none"]["token_match"]
    assert 0.55 <= base <= 0.80, base
    assert ft >= base + 0.08, (base, ft)
    for method in ("base", "ft", "ft_aug"):
        assert r[method]["none"]["tpr"] == 1.0
        assert r[method]["crop-resize_0.6"]["tpr"] <= 0.2
        for cells in r[method].values():
            assert cells["fpr_null"] <= 0.15, r[method]
    cell = "crop-pad_0.6"
    assert r["base"][cell]["tpr"] <= 0.2
    assert r["ft_aug"][cell]["tpr"] >= r["base"][cell]["tpr"] + 0.5
    assert (r["ft_aug"][cell]["token_match"]
            >= r["base"][cell]["token_match"] + 0.08)
    assert r["ft_aug"]["rotation_3"]["tpr"] >= r["base"]["rotation_3"]["tpr"] + 0.15


def test_audio_twin_mimi_ft_improves_token_match():
    """The Mimi twin (VERDICT r4 #1 second assert): RCC finetuning with the
    real audio train step lifts validation_token_match over the pretrained
    base, clean and under a validation augmentation.

    Measured at this budget/seed: base [0.48, 0.34] -> ft [0.55, 0.48]
    clean; noise [0.48, 0.39] -> [0.53, 0.48]."""
    import numpy as np

    from repro_tiny import run_audio

    r = run_audio(pretrain_steps=600, ft_steps=600, seed=0,
                  log=lambda *a, **k: None)
    base = np.mean(r["base"]["none"])
    ft = np.mean(r["ft"]["none"])
    assert 0.25 <= base <= 0.65, r  # pretrained to a mid base level
    assert ft >= base + 0.03, r
    assert (np.mean(r["ft"]["noise_0.01"])
            >= np.mean(r["base"]["noise_0.01"]) + 0.02), r
