"""Audio robustness augmentations, jittable over [B, T, 1] waveforms.

Counterpart of ``wmar_audio/training/augmentations.py`` (speed, echo, noise
colors, filters, smoothing, amplitude). Compression codecs: MP3 runs on the
host through the libmp3lame ctypes bridge; EnCodec/DAC/Mimi are exact JAX
ports fed converted weights. All params are static; stochastic augs take an
rng.
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


def boost_audio(audio, amount_pct: float, rng=None):
    """Boost volume by ``amount_pct`` percent (augmentations.py:403-419)."""
    return audio * (1.0 + amount_pct / 100.0)


def duck_audio(audio, amount_pct: float, rng=None):
    """Duck volume by ``amount_pct`` percent (augmentations.py:420-436)."""
    return audio * (1.0 - amount_pct / 100.0)


def _resample_len(audio, n_out: int):
    """Resample along the time axis (1) to ``n_out`` samples. Linear kernel
    with antialiasing on downsample — TPU-portable (the XLA TPU FFT only
    supports restricted sizes, so no rfft here; the reference uses julius
    sinc kernels)."""
    n_in = audio.shape[1]
    audio = audio.astype(jnp.float32)
    shape = (audio.shape[0], n_out) + audio.shape[2:]
    return jax.image.resize(audio, shape, method="linear", antialias=n_out < n_in)


def updown_resample(audio, intermediate_freq: int, sample_rate: int = 24000, rng=None):
    """Resample to ``intermediate_freq`` and back (augmentations.py:437-459)."""
    n = audio.shape[1]
    n_mid = int(round(n * intermediate_freq / sample_rate))
    return _resample_len(_resample_len(audio, n_mid), n)


def temporal_crop(audio, keep_ratio: float, rng):
    """Keep a random contiguous ``keep_ratio`` fraction (augmentations.py:525-550).
    Output keeps the input length, zero-padded (fixed shapes under jit); the
    reference returns the shorter clip — detection-wise equivalent."""
    n = audio.shape[1]
    keep = int(n * keep_ratio)
    start = jax.random.randint(rng, (), 0, n - keep + 1)
    idx = jnp.arange(n)[None, :, None]
    mask = (idx >= start) & (idx < start + keep)
    rolled = jnp.where(mask, audio, 0.0)
    # shift the kept segment to the front (what re-encoding a shorter file sees)
    return jnp.roll(rolled, -start, axis=1)


class MimiCompression:
    """Neural-codec compression attack through a (converted or finetuned)
    Mimi encode/decode round trip — the counterpart slot of the reference's
    DacCompression/EncodecCompression (augmentations.py:551-628), using the
    codec this pipeline already ships weights-compatible."""

    def __init__(self, mimi, params):
        self.mimi = mimi
        self.params = params
        self._fn = jax.jit(self._roundtrip)

    def _roundtrip(self, params, audio):
        codes = self.mimi.apply(params, audio, method=self.mimi.encode)
        return self.mimi.apply(params, codes, method=self.mimi.decode)

    def __call__(self, audio, param=None, rng=None):
        out = self._fn(self.params, audio)
        n = min(out.shape[-1], audio.shape[-1])
        return out[..., :n]


class MP3Compression:
    """MP3 round trip on the host (the reference's ffmpeg/libmp3lame attack,
    ``training/augmentations.py:470-500``, grid bitrates 16/64/128 kbps at
    :629-656). Default bridge is :mod:`wmar_tpu.native.mp3` — a direct
    ctypes binding of the system ``libmp3lame`` (encoder + HIP decoder)
    with latency-aligned output; a custom ``encoder``
    (fn: float32 [B,T], sr, kbps -> float32 [B,T]) can be plugged in."""

    def __init__(self, sample_rate: int = 24000, encoder=None):
        self.sample_rate = sample_rate
        if encoder is None:
            from wmar_tpu.native import mp3 as _mp3

            if not _mp3.available():
                raise RuntimeError(
                    "MP3Compression: libmp3lame not found on this host and no "
                    "encoder bridge was supplied."
                )
            encoder = _mp3.mp3_roundtrip
        self.encoder = encoder

    def __call__(self, audio, bitrate_kbps: float, rng=None):
        import numpy as np

        x = np.asarray(audio, dtype=np.float32)
        chan = x.ndim == 3  # [B, T, 1] grid convention
        if chan:
            x = x[..., 0]
        out = self.encoder(x, self.sample_rate, int(bitrate_kbps))
        return jnp.asarray(out[..., None] if chan else out)


def mp3_available() -> bool:
    from wmar_tpu.native import mp3 as _mp3

    return _mp3.available()


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def mp3_compression_st(audio, bitrate_kbps: int, sample_rate: int = 24000):
    """Jit-compatible MP3 round trip with a straight-through gradient — the
    reference's train-time ``MP3Compression(passthrough=True)``
    (``training/augmentations.py:486-494``): forward applies the host codec
    via ``pure_callback``, backward is identity (custom_vjp; pure_callback
    itself refuses JVP)."""
    import numpy as np

    def host_fn(x):
        from wmar_tpu.native import mp3 as _mp3

        chan = x.ndim == 3
        wav = x[..., 0] if chan else x
        out = _mp3.mp3_roundtrip(np.asarray(wav, np.float32), sample_rate,
                                 int(bitrate_kbps))
        return (out[..., None] if chan else out).astype(np.float32)

    return jax.pure_callback(
        host_fn, jax.ShapeDtypeStruct(audio.shape, jnp.float32),
        audio.astype(jnp.float32),
    )


def _mp3_st_fwd(audio, bitrate_kbps, sample_rate):
    return mp3_compression_st(audio, bitrate_kbps, sample_rate), None


def _mp3_st_bwd(bitrate_kbps, sample_rate, _res, g):
    return (g,)  # straight-through


mp3_compression_st.defvjp(_mp3_st_fwd, _mp3_st_bwd)


def get_validation_augs(sample_rate: int = 24000, frame_size: int = 1920,
                        mimi_codec=None, encodec=None, dac=None,
                        ) -> List[Tuple[str, object, List[float]]]:
    """The audio eval grid (``training/augmentations.py:629-656``): every
    reference family at the same strengths, including MP3 compression at
    16/64/128 kbps via the libmp3lame bridge (auto-skipped only if the host
    lacks the library). TimeStretch is commented out in the reference's own
    grid. ``encodec``/``dac`` take converted
    :class:`wmar_tpu.audio.codecs.CodecCompression` instances (exact ports);
    ``mimi_codec`` adds a Mimi round-trip slot."""
    frame_ms = 1000 * frame_size / sample_rate  # 80 ms
    shift = lambda ms: ms / 1000 * sample_rate  # noqa: E731
    augs: List[Tuple[str, object, List[float]]] = [
        ("identity", lambda x, p, r: x, [0]),
        ("speed", lambda x, p, r: speed(x, p), [0.75, 0.9, 1.0, 1.1, 1.25]),
        ("echo", lambda x, p, r: echo(x, p[0], p[1]), [(0.1, 0.2), (0.3, 0.5), (0.5, 0.7)]),
        ("noise", lambda x, p, r: gaussian_noise(x, p, r), [0.001, 0.01, 0.05]),
        ("pink-noise", lambda x, p, r: pink_noise(x, p, r), [0.01, 0.05, 0.1]),
        ("lowpass", lambda x, p, r: lowpass(x, p / (sample_rate / 2)),
         [1000, 3000, 8000]),
        ("highpass", lambda x, p, r: highpass(x, p / (sample_rate / 2)),
         [100, 500, 1000]),
        ("bandpass", lambda x, p, r: bandpass(x, p[0] / (sample_rate / 2), p[1] / (sample_rate / 2)),
         [(300, 3000), (500, 5000), (1000, 8000)]),
        ("smooth", lambda x, p, r: smooth(x, max(3, int(p * sample_rate)) | 1),
         [0.001, 0.005, 0.01]),
        ("boost", lambda x, p, r: boost_audio(x, p), [50, 90]),
        ("duck", lambda x, p, r: duck_audio(x, p), [50, 90]),
        ("updown-resample", lambda x, p, r: updown_resample(x, int(p), sample_rate),
         [sample_rate, int(sample_rate * 1.5), sample_rate * 2]),
        ("time-shift", lambda x, p, r: time_shift(x, shift(p) / x.shape[-1]),
         [frame_ms / 8, frame_ms / 4, frame_ms / 2]),
        ("temporal-crop", lambda x, p, r: temporal_crop(x, p, r), [0.5, 0.7, 0.9]),
    ]
    if mp3_available():
        mp3 = MP3Compression(sample_rate)
        augs.append(("mp3-compression", lambda x, p, r: mp3(x, p), [16, 64, 128]))
    if mimi_codec is not None:
        augs.append(("mimi-compression", lambda x, p, r: mimi_codec(x), [0.0]))
    if encodec is not None:
        augs.append(("encodec-compression", lambda x, p, r: encodec(x), [0.0]))
    if dac is not None:
        augs.append(("dac-compression", lambda x, p, r: dac(x), [0.0]))
    return augs
