"""Temporal synchronization for audio: square-wave gated pixel watermark.

Port of ``wmar_audio/watermark/sync.py``: a per-sample watermark (AudioSeal
in the reference; pluggable here) is gated by a square-wave temporal mask;
detection produces a per-sample presence signal whose period/phase reveal
speed-up and shift, which are then inverted by resampling.

The cross-correlation search runs on the host (numpy FFT correlation over a
downsampled 1-D signal — microseconds); embedding/detection are device
calls through the pluggable watermark model.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def square_template(n_samples: int, period: int, shift: int = 0) -> np.ndarray:
    t = np.arange(n_samples)
    return (((t - shift) % period) < (period // 2)).astype(np.float64)


def cross_correlation_search(signal: np.ndarray, t_min: int, t_max: int, step: int):
    """Coarse-to-fine period search + phase from the correlation argmax
    (``sync.py:79-107``)."""
    from scipy.signal import correlate

    n = len(signal)

    def peak(period):
        c = correlate(signal, square_template(n, period), mode="full")
        return np.max(np.abs(c)), c

    best_period, best_corr = None, -np.inf
    for period in range(int(t_min), int(t_max) + 1, step):
        p, _ = peak(period)
        if p > best_corr:
            best_corr, best_period = p, period
    fine_best, corr = -np.inf, None
    for period in range(max(int(t_min), best_period - step), min(int(t_max), best_period + step) + 1):
        p, c = peak(period)
        if p > fine_best:
            fine_best, best_period, corr = p, period, c
    best_shift = int(np.argmax(corr)) - (n - 1)
    return int(best_period), best_shift, corr


class SyncPattern:
    """``wm_model`` must provide ``get_watermark(audio [B,T,1]) -> delta``
    and ``detect(audio) -> presence [B, T]`` (AudioSeal's interface)."""

    def __init__(
        self,
        wm_model,
        frames_per_period: int = 3,
        frame_size: int = 1920,
        sample_rate: int = 24000,
    ):
        self.wm = wm_model
        self.sample_rate = sample_rate
        self.frame_size = frame_size
        self.samples_per_period = frame_size * frames_per_period

    def mask(self, n_samples: int) -> jnp.ndarray:
        return jnp.asarray(square_template(n_samples, 2 * self.samples_per_period))

    def get_sync_wm(self, audio: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
        delta = self.wm.get_watermark(audio)
        m = self.mask(audio.shape[1])[None, :, None]
        return audio + alpha * delta * m

    def detect_signal(self, audio: jnp.ndarray) -> np.ndarray:
        return np.asarray(self.wm.detect(audio))  # [B, T]

    def get_speedup_and_shift(self, detection_signal: np.ndarray, downsample_factor: int = 8,
                              step: int = 10) -> Tuple[float, int]:
        ds = np.interp(
            np.arange(0, len(detection_signal), downsample_factor),
            np.arange(len(detection_signal)),
            detection_signal,
        )
        t_min = 0.5 * self.samples_per_period * 2 / downsample_factor
        t_max = 1.5 * self.samples_per_period * 2 / downsample_factor
        est_t, est_shift, _ = cross_correlation_search(ds, t_min, t_max, step)
        speedup = self.samples_per_period * 2 / (est_t * downsample_factor)
        shift = int(est_shift * speedup * downsample_factor) % self.frame_size
        return speedup, shift

    def invert(self, audio: jnp.ndarray, speedup: float, shift: int) -> jnp.ndarray:
        """Resample by 1/speedup and drop the leading ``shift`` samples."""
        import jax

        b, t, c = audio.shape
        new_t = int(round(t / speedup))
        resampled = jax.image.resize(audio, (b, new_t, c), "linear", antialias=speedup > 1)
        return resampled[:, shift:, :]
