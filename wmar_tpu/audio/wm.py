"""Audio token watermarking: Maryland greenlist + Gumbel (Aaronson) sampling.

TPU-native port of ``wmar_audio/watermark/engine.py``: the reference
re-seeds a CPU torch Generator per frame per batch row and draws full-vocab
permutations/uniforms; here both samplers are stateless hashes evaluated on
the VPU, so watermarked sampling fuses into the streaming decode scan.

Window hash parity: the reference hash is ``base(seed) XOR tok_1 ... XOR
tok_n`` with ``base`` drawn from the seed (``engine.py:13-26``); we keep the
same structure with a splitmix base.

Scoring (``evals/main_wm.py:43-100``): greenlist hits with first-occurrence
dedup -> binomial tail p-value for Maryland; summed ``-log(1-u)`` ->
Gamma(n, 1) tail for Gumbel.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from wmar_tpu.core.hashing import fmix32, hash_key_token, uniform_from_hash


def window_hash(ngrams: jnp.ndarray, seed: int) -> jnp.ndarray:
    """``[B, n]`` context tokens -> ``[B]`` int32 window hashes.

    n = 0 returns the seed itself (the reference's fixed-hash mode used for
    depformer streams, ``lm.py:637-647``).
    """
    b, n = ngrams.shape
    if n == 0:
        return jnp.full((b,), seed, dtype=jnp.int32)
    base = fmix32(jnp.full((b,), seed, dtype=jnp.uint32))
    acc = base
    for i in range(n):
        acc = acc ^ ngrams[:, i].astype(jnp.uint32)
    return acc.astype(jnp.int32)


def _warp_probs(logits, temp, top_k, top_p):
    probs = jax.nn.softmax(logits.astype(jnp.float32) / jnp.float32(temp), axis=-1)
    v = probs.shape[-1]
    if top_p and top_p > 0.0:
        sort_idx = jnp.argsort(-probs, axis=-1)
        sorted_p = jnp.take_along_axis(probs, sort_idx, axis=-1)
        cum = jnp.cumsum(sorted_p, axis=-1)
        keep_sorted = (cum - sorted_p) <= top_p
        keep = jnp.zeros_like(keep_sorted).at[
            jnp.arange(probs.shape[0])[:, None], sort_idx
        ].set(keep_sorted)
        probs = jnp.where(keep, probs, 0.0)
        probs = probs / probs.sum(-1, keepdims=True)
    elif top_k and top_k > 0:
        k = min(top_k, v)
        thresh = jax.lax.top_k(probs, k)[0][:, -1:]
        probs = jnp.where(probs >= thresh, probs, 0.0)
        probs = probs / probs.sum(-1, keepdims=True)
    return probs


def gumbel_sample(
    logits: jnp.ndarray,
    window_hashes: jnp.ndarray,
    use_sampling: bool = True,
    temp: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    salt: int = 0,
) -> jnp.ndarray:
    """Aaronson sampling: ``argmax_t u(hash, t)^(1/p_t)`` — distortion-free
    given the hash. ``logits [B, V]`` -> tokens ``[B]``."""
    if not use_sampling or temp <= 0.0:
        return jnp.argmax(logits, axis=-1)
    probs = _warp_probs(logits, temp, top_k, top_p)
    v = probs.shape[-1]
    u = uniform_from_hash(hash_key_token(window_hashes[:, None], jnp.arange(v), salt))
    # argmax u^(1/p) == argmax log(u)/p; p == 0 -> -inf (never selected).
    score = jnp.where(probs > 0, jnp.log(jnp.maximum(u, 1e-12)) / jnp.maximum(probs, 1e-12), -jnp.inf)
    return jnp.argmax(score, axis=-1)


def gumbel_score(tokens: jnp.ndarray, window_hashes: jnp.ndarray, salt: int = 0) -> jnp.ndarray:
    """Per-token score ``-log(1 - u(hash, token))`` (``engine.py:122-134``)."""
    u = uniform_from_hash(hash_key_token(window_hashes, tokens, salt))
    return -jnp.log1p(-jnp.minimum(u, 1.0 - 1e-7))


def maryland_green(tokens: jnp.ndarray, window_hashes: jnp.ndarray, gamma: float, salt: int = 0):
    """Greenlist membership of individual tokens."""
    bits = hash_key_token(window_hashes, tokens, salt)
    return bits < jnp.uint32(min(gamma * 2.0**32, 2.0**32 - 1))


def maryland_sample(
    logits: jnp.ndarray,
    window_hashes: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    use_sampling: bool = True,
    temp: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    gamma: float = 0.5,
    delta: float = 1.0,
    salt: int = 0,
) -> jnp.ndarray:
    """Greenlist-biased sampling (``engine.py:78-104``)."""
    v = logits.shape[-1]
    green = maryland_green(window_hashes[:, None], jnp.arange(v), gamma, salt)
    logits = logits + delta * green.astype(logits.dtype)
    if not use_sampling or temp <= 0.0:
        return jnp.argmax(logits, axis=-1)
    probs = _warp_probs(logits, temp, top_k, top_p)
    assert rng is not None, "maryland sampling needs an rng"
    return jax.random.categorical(rng, jnp.log(jnp.maximum(probs, 1e-12)), axis=-1)


def wm_sample_token(
    logits: jnp.ndarray,
    method: str,
    window_hashes: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    use_sampling: bool = True,
    temp: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    gamma: float = 0.5,
    delta: float = 1.0,
    salt: int = 0,
) -> jnp.ndarray:
    """Dispatcher mirroring ``wm_sample_token`` (``engine.py:137-157``)."""
    if method == "gumbel":
        return gumbel_sample(logits, window_hashes, use_sampling, temp, top_k, top_p, salt)
    if method == "maryland":
        return maryland_sample(
            logits, window_hashes, rng, use_sampling, temp, top_k, top_p, gamma, delta, salt
        )
    # plain sampling
    if not use_sampling or temp <= 0.0:
        return jnp.argmax(logits, axis=-1)
    probs = _warp_probs(logits, temp, top_k, top_p)
    assert rng is not None
    return jax.random.categorical(rng, jnp.log(jnp.maximum(probs, 1e-12)), axis=-1)


# ---------------------------------------------------------------------------
# Stream scoring / detection
# ---------------------------------------------------------------------------


def score_stream_maryland(
    tokens: jnp.ndarray,
    hashes: jnp.ndarray,
    gamma: float,
    salt: int = 0,
):
    """Greenlist scoring with first-occurrence (token, hash) dedup, like the
    reference's ``seen_tokens`` filter (``main_wm.py:85-100``).

    ``tokens, hashes: [T]``. Returns (n_green, n_scored).
    """
    green = maryland_green(hashes, tokens, gamma, salt)
    pair = jnp.stack([tokens, hashes], axis=1)
    eq = (pair[:, None, :] == pair[None, :, :]).all(-1)
    t = tokens.shape[0]
    earlier = jnp.tril(jnp.ones((t, t), dtype=bool), k=-1)
    first = ~(eq & earlier).any(axis=1)
    return (green & first).sum(dtype=jnp.int32), first.sum(dtype=jnp.int32)


def pvalue_maryland(n_green, n_scored, gamma: float):
    from wmar_tpu.core.detect import pvalue_from_counts

    return pvalue_from_counts(n_green, n_scored, gamma)


def pvalue_gumbel(score_sum: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """H0: sum of -log(1-u) over n tokens ~ Gamma(n, 1);
    p = P[Gamma(n,1) >= s] = gammaincc(n, s)."""
    return jax.scipy.special.gammaincc(n.astype(jnp.float32), score_sum.astype(jnp.float32))
