"""Train-time audio augmenter for the Mimi RCC finetune.

Counterpart of the reference's ``wmar_audio/training/augmenter.py`` +
``training/augmentations.py`` classes: a weighted bank of augmentations,
each configured by a ``{min_*, max_*}`` parameter range, selected per step
by a categorical draw and applied ``num_augs`` times sequentially.

TPU-native design: the whole augmenter is one jittable function. Each
configured augmentation expands into ``n_levels`` branches with parameters
linearly spaced over its [min, max] range (the reference draws a continuous
uniform on the host per batch; under ``jax.lax.switch`` parameters that
shape FIR kernels / shifts / bitrates must be static, so the range is
quantized — ``n_levels`` controls the granularity and the selection
distribution is identical in expectation). MP3 runs via the libmp3lame
host bridge with a straight-through gradient, exactly like the reference's
``MP3Compression(passthrough=True)``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wmar_tpu.audio import augmentations as A

# name -> (param ranges with reference defaults, builder(params, sr) -> [branch fns])
# Reference defaults: training/augmentations.py class __init__ signatures.
_DEFAULTS: Dict[str, Dict[str, float]] = {
    "identity": {},
    "speed": {"min_speed": 0.5, "max_speed": 1.5},
    "time_stretch": {"min_rate": 0.5, "max_rate": 1.5},
    "echo": {"min_volume": 0.1, "max_volume": 0.5,
             "min_duration": 0.1, "max_duration": 0.5},
    "noise_injection": {"min_noise_std": 0.0005, "max_noise_std": 0.0015},
    "pink_noise": {"min_noise_std": 0.005, "max_noise_std": 0.015},
    "lowpass_filter": {"min_cutoff_freq": 2500.0, "max_cutoff_freq": 7500.0},
    "highpass_filter": {"min_cutoff_freq": 250.0, "max_cutoff_freq": 750.0},
    "bandpass_filter": {"min_cutoff_low": 150.0, "max_cutoff_low": 450.0,
                        "min_cutoff_high": 4000.0, "max_cutoff_high": 10000.0},
    "smooth": {"min_window_frac": 0.001, "max_window_frac": 0.01},
    "boost_audio": {"min_amount": 10.0, "max_amount": 30.0},
    "duck_audio": {"min_amount": 10.0, "max_amount": 30.0},
    "up_down_resample": {"intermediate_freq": 32000.0},
    "mp3_compression": {"min_bitrate": 64.0, "max_bitrate": 320.0},
    "time_shift": {"min_shift_ms": 50.0, "max_shift_ms": 200.0},
    "temporal_crop": {"min_crop_ratio": 0.5, "max_crop_ratio": 0.9},
}


def _levels(lo: float, hi: float, n: int) -> np.ndarray:
    if n == 1 or lo == hi:
        return np.asarray([(lo + hi) / 2.0])
    return np.linspace(lo, hi, n)


@dataclasses.dataclass(frozen=True)
class AugBranch:
    name: str
    label: str
    fn: Callable[[jnp.ndarray, jax.Array], jnp.ndarray]


def _expand(name: str, p: Dict[str, float], sr: int, n: int) -> List[AugBranch]:
    """One configured augmentation -> quantized parameter branches."""
    if name == "identity":
        return [AugBranch(name, "identity", lambda x, k: x)]
    if name in ("speed", "time_stretch"):
        lo = p.get("min_speed", p.get("min_rate"))
        hi = p.get("max_speed", p.get("max_rate"))
        # time_stretch (phase-vocoder tempo change) is approximated by
        # resampling like speed — the reference comments time_stretch out of
        # its own validation grid (training/augmentations.py:629-656)
        return [AugBranch(name, f"{name}_{v:.2f}",
                          lambda x, k, v=float(v): A.speed(x, v))
                for v in _levels(lo, hi, n)]
    if name == "echo":
        vols = _levels(p["min_volume"], p["max_volume"], n)
        durs = _levels(p["min_duration"], p["max_duration"], n)
        return [AugBranch(name, f"echo_{d:.2f}s_{v:.2f}",
                          lambda x, k, d=float(d), v=float(v):
                          A.echo(x, d * sr / x.shape[1], v))
                for d, v in zip(durs, vols)]
    if name == "noise_injection":
        return [AugBranch(name, f"noise_{v:.4f}",
                          lambda x, k, v=float(v): A.gaussian_noise(x, v, k))
                for v in _levels(p["min_noise_std"], p["max_noise_std"], n)]
    if name == "pink_noise":
        return [AugBranch(name, f"pink_{v:.4f}",
                          lambda x, k, v=float(v): A.pink_noise(x, v, k))
                for v in _levels(p["min_noise_std"], p["max_noise_std"], n)]
    if name == "lowpass_filter":
        return [AugBranch(name, f"lowpass_{v:.0f}",
                          lambda x, k, v=float(v): A.lowpass(x, v / (sr / 2)))
                for v in _levels(p["min_cutoff_freq"], p["max_cutoff_freq"], n)]
    if name == "highpass_filter":
        return [AugBranch(name, f"highpass_{v:.0f}",
                          lambda x, k, v=float(v): A.highpass(x, v / (sr / 2)))
                for v in _levels(p["min_cutoff_freq"], p["max_cutoff_freq"], n)]
    if name == "bandpass_filter":
        los = _levels(p["min_cutoff_low"], p["max_cutoff_low"], n)
        his = _levels(p["min_cutoff_high"], p["max_cutoff_high"], n)
        return [AugBranch(name, f"bandpass_{lo:.0f}_{hi:.0f}",
                          lambda x, k, lo=float(lo), hi=float(hi):
                          A.bandpass(x, lo / (sr / 2), hi / (sr / 2)))
                for lo, hi in zip(los, his)]
    if name == "smooth":
        return [AugBranch(name, f"smooth_{v:.4f}",
                          lambda x, k, w=max(3, int(float(v) * sr)) | 1:
                          A.smooth(x, w))
                for v in _levels(p["min_window_frac"], p["max_window_frac"], n)]
    if name == "boost_audio":
        return [AugBranch(name, f"boost_{v:.0f}",
                          lambda x, k, v=float(v): A.boost_audio(x, v))
                for v in _levels(p["min_amount"], p["max_amount"], n)]
    if name == "duck_audio":
        return [AugBranch(name, f"duck_{v:.0f}",
                          lambda x, k, v=float(v): A.duck_audio(x, v))
                for v in _levels(p["min_amount"], p["max_amount"], n)]
    if name == "up_down_resample":
        f = int(p["intermediate_freq"])
        return [AugBranch(name, f"updown_{f}",
                          lambda x, k: A.updown_resample(x, f, sr))]
    if name == "mp3_compression":
        if not A.mp3_available():
            raise RuntimeError("mp3_compression configured but libmp3lame "
                               "is unavailable on this host")
        return [AugBranch(name, f"mp3_{int(v)}",
                          lambda x, k, v=int(v): A.mp3_compression_st(x, v, sr))
                for v in _levels(p["min_bitrate"], p["max_bitrate"], n)]
    if name == "time_shift":
        return [AugBranch(name, f"shift_{v:.0f}ms",
                          lambda x, k, v=float(v):
                          A.time_shift(x, (v / 1000.0 * sr) / x.shape[1]))
                for v in _levels(p["min_shift_ms"], p["max_shift_ms"], n)]
    if name == "temporal_crop":
        return [AugBranch(name, f"crop_{v:.2f}",
                          lambda x, k, v=float(v): A.temporal_crop(x, v, k))
                for v in _levels(p["min_crop_ratio"], p["max_crop_ratio"], n)]
    raise ValueError(
        f"Augmentation {name} not found. Available: {sorted(_DEFAULTS)}")


class Augmenter:
    """Weighted random augmentation bank (``training/augmenter.py:53-160``).

    Args:
        augs: relative weights, e.g. ``{"identity": 1, "noise_injection": 1}``.
        augs_params: per-aug overrides of the ``min_*/max_*`` defaults.
        num_augs: augmentations applied sequentially per call.
        sample_rate: audio sample rate.
        n_levels: parameter-range quantization (see module docstring).
    """

    def __init__(self, augs: Dict[str, float],
                 augs_params: Optional[Dict[str, Dict[str, float]]] = None,
                 num_augs: int = 1, sample_rate: int = 24000,
                 n_levels: int = 4):
        augs_params = augs_params or {}
        self.sample_rate = sample_rate
        self.num_augs = num_augs
        branches: List[AugBranch] = []
        probs: List[float] = []
        for name, weight in augs.items():
            if weight <= 0:
                continue
            params = dict(_DEFAULTS[name]) if name in _DEFAULTS else None
            if params is None:
                raise ValueError(
                    f"Augmentation {name} not found. Available: {sorted(_DEFAULTS)}")
            params.update(augs_params.get(name, {}))
            expanded = _expand(name, params, sample_rate, n_levels)
            branches += expanded
            probs += [float(weight) / len(expanded)] * len(expanded)
        if not branches:  # default to identity, like the reference
            branches = [AugBranch("identity", "identity", lambda x, k: x)]
            probs = [1.0]
        self.branches = branches
        self.log_probs = jnp.asarray(
            np.log(np.asarray(probs) / np.sum(probs)).astype(np.float32))
        self.labels = [b.label for b in branches]

    def __call__(self, audio: jnp.ndarray, rng: jax.Array
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[B, T, C] -> (augmented audio, selected branch index [num_augs])."""
        fns = [lambda x, k, b=b: b.fn(x, k) for b in self.branches]
        picked = []
        for i in range(self.num_augs):
            k_pick, k_aug, rng = jax.random.split(rng, 3)
            idx = jax.random.categorical(k_pick, self.log_probs)
            audio = jax.lax.switch(idx, fns, audio, k_aug)
            picked.append(idx)
        return audio, jnp.stack(picked)
