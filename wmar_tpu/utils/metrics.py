"""Evaluation metrics (reference: ``wmar/utils/metrics.py``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def psnr(a, b, max_val: float = 255.0) -> float:
    """PSNR between two images (any matching shape), values scaled to
    ``max_val`` like the reference's PIL-array comparison."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(max_val**2 / mse))


def psnr_pm1(a, b) -> float:
    """PSNR for images in [-1, 1] mapped to the 0-255 convention."""
    a8 = (np.asarray(a) / 2.0 + 0.5) * 255.0
    b8 = (np.asarray(b) / 2.0 + 0.5) * 255.0
    return psnr(a8, b8)


def l0_token_mismatch(codes, orig_codes) -> jnp.ndarray:
    """Fraction of mismatched tokens per row: ``[B, T] -> [B]``."""
    codes = jnp.asarray(codes)
    orig_codes = jnp.asarray(orig_codes)
    return (codes != orig_codes).mean(axis=-1)


def sisnr(est, ref) -> float:
    """Scale-invariant SNR in dB (the reference's audio quality metric,
    ``wmar_audio/evals/metrics.py``). Inputs [T] or [B, T, 1]."""
    est = np.asarray(est, dtype=np.float64).reshape(-1)
    ref = np.asarray(ref, dtype=np.float64).reshape(-1)
    ref = ref - ref.mean()
    est = est - est.mean()
    s = (est @ ref) / (ref @ ref + 1e-12) * ref
    noise = est - s
    return float(10 * np.log10((s @ s + 1e-12) / (noise @ noise + 1e-12)))
