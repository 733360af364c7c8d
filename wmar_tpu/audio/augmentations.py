"""Audio robustness augmentations, jittable over [B, T, 1] waveforms.

Counterpart of ``wmar_audio/training/augmentations.py`` (speed, echo, noise
colors, filters, smoothing, amplitude). Compression codecs (MP3/EnCodec/DAC)
are external-backend slots like the image neural compressors. All params are
static; stochastic augs take an rng.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def identity(audio, rng=None):
    return audio


def amplitude_scale(audio, factor: float, rng=None):
    return jnp.clip(audio * factor, -1.0, 1.0)


def gaussian_noise(audio, std: float, rng):
    return jnp.clip(audio + jax.random.normal(rng, audio.shape) * std, -1.0, 1.0)


def pink_noise(audio, std: float, rng):
    """1/f-shaped noise via FFT filtering of white noise."""
    b, t, c = audio.shape
    white = jax.random.normal(rng, (b, t, c))
    spec = jnp.fft.rfft(white, axis=1)
    freqs = jnp.arange(spec.shape[1], dtype=jnp.float32)
    shape_ = 1.0 / jnp.sqrt(jnp.maximum(freqs, 1.0))
    pink = jnp.fft.irfft(spec * shape_[None, :, None], n=t, axis=1)
    pink = pink / (pink.std() + 1e-8)
    return jnp.clip(audio + pink * std, -1.0, 1.0)


def _fir(audio, kernel: np.ndarray):
    k = jnp.asarray(kernel, jnp.float32)[:, None, None]
    pad = len(kernel) // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHC", "HIO", "NHC"))
    return jax.lax.conv_general_dilated(x, k, (1,), "VALID", dimension_numbers=dn)


def _sinc_kernel(cutoff: float, taps: int = 65) -> np.ndarray:
    """Windowed-sinc lowpass, cutoff as a fraction of Nyquist."""
    n = np.arange(taps) - (taps - 1) / 2
    h = np.sinc(cutoff * n) * cutoff
    h *= np.hamming(taps)
    return (h / h.sum()).astype(np.float32)


def lowpass(audio, cutoff: float, rng=None):
    return _fir(audio, _sinc_kernel(cutoff))


def highpass(audio, cutoff: float, rng=None):
    low = _fir(audio, _sinc_kernel(cutoff))
    return jnp.clip(audio - low, -1.0, 1.0)


def bandpass(audio, low_c: float, high_c: float, rng=None):
    return jnp.clip(lowpass(audio, high_c) - lowpass(audio, low_c), -1.0, 1.0)


def smooth(audio, window: int, rng=None):
    k = np.ones(window, dtype=np.float32) / window
    return _fir(audio, k)


def echo(audio, delay_frac: float = 0.1, volume: float = 0.5, rng=None):
    """Single reflection at ``delay_frac`` of the clip length."""
    t = audio.shape[1]
    d = max(1, int(delay_frac * t))
    delayed = jnp.pad(audio, ((0, 0), (d, 0), (0, 0)))[:, :t]
    return jnp.clip(audio + volume * delayed, -1.0, 1.0)


def speed(audio, factor: float, rng=None):
    """Resample to change speed, then pad/crop back to the original length
    (keeps static shapes; the content plays at ``factor`` x speed)."""
    b, t, c = audio.shape
    new_t = max(1, int(round(t / factor)))
    resampled = jax.image.resize(audio, (b, new_t, c), method="linear", antialias=factor > 1)
    if new_t >= t:
        return resampled[:, :t]
    return jnp.pad(resampled, ((0, 0), (0, t - new_t), (0, 0)))


def time_shift(audio, shift_frac: float, rng=None):
    t = audio.shape[1]
    s = int(shift_frac * t)
    return jnp.roll(audio, s, axis=1)


def get_validation_augs() -> List[Tuple[str, object, List[float]]]:
    """The audio eval grid (subset of ``training/augmentations.py:629``)."""
    return [
        ("identity", lambda x, p, r: x, [0]),
        ("noise", lambda x, p, r: gaussian_noise(x, p, r), [0.001, 0.01, 0.05]),
        ("pink-noise", lambda x, p, r: pink_noise(x, p, r), [0.01, 0.05]),
        ("lowpass", lambda x, p, r: lowpass(x, p), [0.5, 0.25]),
        ("highpass", lambda x, p, r: highpass(x, p), [0.02, 0.1]),
        ("smooth", lambda x, p, r: smooth(x, int(p)), [3, 9]),
        ("echo", lambda x, p, r: echo(x, p), [0.05, 0.1]),
        ("speed", lambda x, p, r: speed(x, p), [0.9, 1.1]),
        ("amplitude", lambda x, p, r: amplitude_scale(x, p), [0.5, 1.5]),
    ]
