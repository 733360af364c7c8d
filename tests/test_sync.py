"""Synchronization: quadrant masks, message assignment, geometry fitting.

Uses a parity mock embedder (message id quantized into the blue channel) so
the full estimate->revert loop is exercised without WAM weights — geometric
attacks move the embedded quadrant ids with the pixels exactly like a real
pixel watermark would.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.augmentations import geometric as G
from wmar_tpu.sync.manager import SyncManager
from wmar_tpu.sync.wam_logic import (
    WamSync,
    create_grid_mask,
    fit_best_aug,
    positions_from_predictions,
    quadrant_messages,
    revert_augmentation,
)

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"

MSGS = quadrant_messages()


class MockEmbedder:
    """Encodes the message id (0..3) as a quantized blue-channel level;
    detection is exact and local, so it survives geometric transforms."""

    LEVELS = np.array([0.15, 0.38, 0.62, 0.85])

    def embed(self, img01, msg):
        msg_np = np.asarray(msg)[0]
        mid = int(np.flatnonzero((MSGS == msg_np).all(axis=1))[0])
        blue = jnp.full(img01.shape[:3], self.LEVELS[mid], img01.dtype)
        return img01.at[..., 2].set(blue)

    def detect(self, img01):
        blue = np.asarray(img01[..., 2])  # [B, H, W]
        d = np.abs(blue[..., None] - self.LEVELS[None, None, None, :])
        mid = d.argmin(-1)  # [B, H, W]
        close = d.min(-1) < 0.05
        bits = MSGS[mid].transpose(0, 3, 1, 2).astype(np.float32) * 2 - 1  # [B, 32, H, W]
        mask_logit = np.where(close, 8.0, -8.0)[:, None]  # [B, 1, H, W]
        return jnp.asarray(np.concatenate([mask_logit, bits], axis=1))


@pytest.fixture(scope="module")
def sync():
    from wmar_tpu.sync.wam_logic import SyncConfidence

    # The mock embeds only inside the (buffered) quadrant masks, so coverage
    # is lower than a real WAM's; loosen the confidence gate accordingly.
    return WamSync(MockEmbedder(), image_size=64, conf=SyncConfidence(coverage=0.12))


@pytest.fixture
def imgs(rng):
    x = rng.uniform(-1, 1, size=(1, 64, 64, 3)).astype(np.float32)
    # Neutral blue channel so unmarked pixels don't collide with the mock's
    # quantization levels (a real WAM has a presence mask for this).
    x[..., 2] = 0.0
    return jnp.asarray(x)


def test_grid_mask_quadrants():
    m = create_grid_mask(256)
    assert m.shape == (4, 256, 256)
    assert m[0, 10, 10] == 1 and m[0, 10, 200] == 0
    assert m[1, 10, 200] == 1
    assert m[2, 200, 10] == 1
    assert m[3, 200, 200] == 1
    # center buffer cleared in all masks
    assert m[:, 128, :].sum() == 0 and m[:, :, 128].sum() == 0


def test_positions_from_predictions_exact():
    h = w = 8
    mids = np.arange(4).repeat(16).reshape(h, w)
    bits = jnp.asarray(MSGS[mids].transpose(2, 0, 1).astype(np.float32) * 2 - 1)
    mask = jnp.full((h, w), 8.0)
    pos = np.asarray(positions_from_predictions(mask, bits, jnp.asarray(MSGS)))
    np.testing.assert_array_equal(pos, mids)
    # masked-out pixels get -1
    pos2 = np.asarray(positions_from_predictions(jnp.full((h, w), -8.0), bits, jnp.asarray(MSGS)))
    assert (pos2 == -1).all()


def test_fit_identity():
    pos = -np.ones((64, 64), dtype=np.int32)
    q = create_grid_mask(64)
    for k in range(4):
        pos[q[k] > 0] = k
    rot, cut_i, cut_j, flip = fit_best_aug(pos)
    assert rot == 0 and not flip
    # any cut inside the cleared center band separates the quadrants
    assert 13 <= cut_i <= 51 and 13 <= cut_j <= 51


def test_add_remove_sync_identity(sync, imgs):
    synced = sync.add_sync(imgs)
    assert synced.shape == imgs.shape
    out = sync.remove_sync(synced)
    # identity transform -> estimated as no-op, image unchanged
    np.testing.assert_allclose(np.asarray(out), np.asarray(synced), atol=1e-5)


def test_sync_estimates_flip(sync, imgs):
    synced = sync.add_sync(imgs)
    flipped = G.hflip(synced)
    aug_info, _ = sync.estimate((flipped[0] + 1) / 2)
    assert aug_info[3] is True or aug_info[3] == 1
    out = sync.remove_sync(flipped)
    np.testing.assert_allclose(np.asarray(out), np.asarray(synced), atol=1e-5)


def test_sync_estimates_rotation(rng):
    """At full 256px resolution (quadrants fill the frame), a 10-degree
    rotation is recovered within a few degrees and reverted."""
    from wmar_tpu.sync.wam_logic import SyncConfidence

    sync256 = WamSync(MockEmbedder(), image_size=256, conf=SyncConfidence(coverage=0.5))
    x = rng.uniform(-1, 1, size=(1, 256, 256, 3)).astype(np.float32)
    x[..., 2] = 0.0
    synced = sync256.add_sync(jnp.asarray(x))
    rotated = G.rotate((synced + 1) / 2, 10) * 2 - 1
    aug_info, _ = sync256.estimate((rotated[0] + 1) / 2)
    assert abs(abs(aug_info[0]) - 10) <= 3, aug_info
    assert not aug_info[3]
    # reverting re-aligns the quadrant map with the grid
    reverted01 = revert_augmentation((rotated + 1) / 2, aug_info)
    aug2, _ = sync256.estimate(reverted01[0])
    assert abs(aug2[0]) <= 3, aug2


def test_sync_low_coverage_noop(imgs):
    # no watermark + default (strict) confidence -> identity revert
    strict = WamSync(MockEmbedder(), image_size=64)
    out = strict.remove_sync(imgs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)


def test_manager_dispatch(sync, imgs):
    m = SyncManager(sync.__class__(MockEmbedder(), image_size=64))
    s = m.add_sync(imgs)
    r = m.remove_sync(s)
    assert r.shape == imgs.shape
