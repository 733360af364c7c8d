"""Watermark detection: re-tokenized codes -> p-value, on device.

Reference behavior (``gentime_watermark.py:278-344``): gather all (h+1)-grams
of the code stream, dedup, count greenlist hits among unique ngrams, and
compute the binomial tail p-value ``betainc(n_green, 1 + n - n_green, gamma)``.
The reference runs this as cached Python dict lookups on the CPU; here the
whole pass is a jitted, vmap-able device function (`jax.scipy.special.betainc`
included), so detection sweeps over thousands of augmented images never leave
the chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wmar_tpu.core.ngrams import extract_ngrams, first_occurrence_mask
from wmar_tpu.core.spec import WatermarkSpec


def score_codes(spec: WatermarkSpec, greenlist, codes: jnp.ndarray):
    """Score one code stream.

    Args:
      spec: watermark spec.
      greenlist: object with ``green_lookup(keys, targets)``.
      codes: int32 ``[T]`` token stream (or flattened token grid).

    Returns:
      ``(n_green, n_scored)`` int32 scalars over unique ngrams.
    """
    rows, keys, targets = extract_ngrams(spec, codes)
    unique = first_occurrence_mask(rows)
    green = greenlist.green_lookup(keys, targets)
    n_scored = unique.sum(dtype=jnp.int32)
    n_green = (green & unique).sum(dtype=jnp.int32)
    return n_green, n_scored


def pvalue_from_counts(n_green: jnp.ndarray, n_scored: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Binomial tail p-value: P[Binom(n_scored, gamma) >= n_green].

    ``betainc(k, n - k + 1, gamma)`` — identical to the reference's
    ``scipy.special.betainc(n_green, 1 + n_scored - n_green, gamma)``.
    ``n_green == 0`` maps to p = 1 (scipy's convention for a = 0).
    """
    a = n_green.astype(jnp.float32)
    b = (1 + n_scored - n_green).astype(jnp.float32)
    p = jax.scipy.special.betainc(jnp.maximum(a, 1.0), b, gamma)
    return jnp.where(n_green <= 0, jnp.float32(1.0), p)


def detect(spec: WatermarkSpec, greenlist, codes: jnp.ndarray) -> jnp.ndarray:
    """Batched detection: ``codes [B, T] -> p-values [B]``. Jittable."""

    def one(c):
        n_green, n_scored = score_codes(spec, greenlist, c)
        return pvalue_from_counts(n_green, n_scored, spec.gamma)

    return jax.vmap(one)(codes)


def green_fraction(spec: WatermarkSpec, greenlist, codes: jnp.ndarray) -> jnp.ndarray:
    """Fraction of unique ngrams that are green, per batch row (diagnostic)."""

    def one(c):
        n_green, n_scored = score_codes(spec, greenlist, c)
        return n_green / jnp.maximum(n_scored, 1)

    return jax.vmap(one)(codes)
