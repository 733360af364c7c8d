"""MP3 compression attack: libmp3lame ctypes bridge round trip.

The reference applies MP3 at 16/64/128 kbps via ffmpeg
(``wmar_audio/training/augmentations.py:470-500,648``); our bridge binds
libmp3lame directly and must return a time-aligned waveform (ffmpeg's
gapless trimming), since misalignment would break watermark detection for
reasons unrelated to the codec.
"""

import numpy as np
import pytest

from wmar_tpu.native import mp3

pytestmark = pytest.mark.skipif(not mp3.available(), reason="libmp3lame not present")

SR = 24000


def _tone(seconds=2.0, f0=440.0, f1=1330.0):
    t = np.arange(int(SR * seconds)) / SR
    return (0.5 * np.sin(2 * np.pi * f0 * t) + 0.2 * np.sin(2 * np.pi * f1 * t)).astype(np.float32)


def _best_offset(x, y, at=8000, w=4000, search=600):
    seg = x[at : at + w]
    return max(range(-search, search + 1), key=lambda s: float(np.dot(seg, y[at + s : at + s + w])))


@pytest.mark.parametrize("bitrate", [16, 64, 128])
def test_roundtrip_aligned_and_faithful(bitrate):
    x = _tone()
    y = mp3.mp3_roundtrip(x, SR, bitrate)
    assert y.shape == x.shape and y.dtype == np.float32
    assert _best_offset(x, y) == 0, "codec latency not stripped"
    snr = 10 * np.log10(np.mean(x**2) / np.mean((x - y) ** 2))
    assert snr > 15.0, f"SNR {snr:.1f} dB too low for a pure tone at {bitrate} kbps"


def test_lower_bitrate_is_lossier():
    rng = np.random.default_rng(0)
    # broadband content separates bitrates much more than a tone does
    x = (0.3 * rng.standard_normal(SR * 2)).astype(np.float32)

    def snr(br):
        y = mp3.mp3_roundtrip(x, SR, br)
        return 10 * np.log10(np.mean(x**2) / np.mean((x - y) ** 2))

    assert snr(128) > snr(16) + 3.0


def test_batched_input():
    x = _tone(1.0)
    xb = np.stack([x, -x])
    yb = mp3.mp3_roundtrip(xb, SR, 64)
    assert yb.shape == xb.shape
    np.testing.assert_allclose(yb[0], -yb[1], atol=2e-2)


def test_in_validation_grid():
    from wmar_tpu.audio.augmentations import get_validation_augs

    augs = dict((name, params) for name, _, params in get_validation_augs())
    assert augs.get("mp3-compression") == [16, 64, 128]


def test_attack_wrapper_shapes():
    import jax.numpy as jnp

    from wmar_tpu.audio.augmentations import MP3Compression

    attack = MP3Compression(SR)
    x = jnp.asarray(_tone(0.5))[None, :]
    y = attack(x, 64)
    assert y.shape == x.shape
