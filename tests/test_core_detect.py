"""N-gram extraction, dedup, and p-value detection, vs a reference oracle."""

import collections
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import special

from wmar_tpu.core import HashGreenlist, WatermarkSpec, detect, score_codes
from wmar_tpu.core.ngrams import first_occurrence_mask, linear_ngrams, spatial_ngrams
from wmar_tpu.core.spec import SeedStrategy, SplitStrategy


def make_spec(**kw):
    base = dict(
        vocab_size=512,
        seed_strategy=SeedStrategy.LINEAR,
        split_strategy=SplitStrategy.RANDOM,
        context_size=1,
        delta=4.0,
        gamma=0.25,
    )
    base.update(kw)
    return WatermarkSpec(**base)


def oracle_ngrams_linear(seq, h):
    """Reference-style sliding windows via itertools (nltk ngrams)."""
    its = itertools.tee(iter(seq), h + 1)
    for i, it in enumerate(its):
        for _ in range(i):
            next(it, None)
    return list(zip(*its))


def oracle_ngrams_spatial(seq, n, dim):
    grid = [seq[i : i + dim] for i in range(0, len(seq), dim)]
    out = []
    if n == 2:
        for i in range(dim):
            for j in range(dim):
                if j == 0:
                    if i > 0:
                        out.append((grid[i - 1][j], grid[i][j]))
                else:
                    out.append((grid[i][j - 1], grid[i][j]))
    else:
        for i in range(dim - 1):
            for j in range(dim - 1):
                out.append((grid[i][j], grid[i][j + 1], grid[i + 1][j], grid[i + 1][j + 1]))
    return out


@pytest.mark.parametrize("h", [1, 2, 3])
def test_linear_ngrams_match_oracle(h, rng):
    seq = rng.integers(0, 512, size=40).astype(np.int32)
    rows, keys, targets = linear_ngrams(jnp.asarray(seq), h)
    oracle = oracle_ngrams_linear(list(seq), h)
    assert rows.shape == (len(oracle), h + 1)
    np.testing.assert_array_equal(np.asarray(rows), np.asarray(oracle))
    np.testing.assert_array_equal(np.asarray(keys), [sum(o[:-1]) for o in oracle])
    np.testing.assert_array_equal(np.asarray(targets), [o[-1] for o in oracle])


@pytest.mark.parametrize("h,n", [(1, 2), (3, 4)])
def test_spatial_ngrams_match_oracle(h, n, rng):
    dim = 8
    seq = rng.integers(0, 512, size=dim * dim).astype(np.int32)
    rows, keys, targets = spatial_ngrams(jnp.asarray(seq), h, dim)
    oracle = oracle_ngrams_spatial(list(seq), n, dim)
    # Order can differ (we emit row-major with j==0 cases inline); compare sets
    got = set(map(tuple, np.asarray(rows).tolist()))
    assert got == set(oracle)
    assert rows.shape[0] == len(oracle)


def test_first_occurrence_mask():
    rows = jnp.array([[1, 2], [3, 4], [1, 2], [3, 4], [5, 6]])
    mask = np.asarray(first_occurrence_mask(rows))
    np.testing.assert_array_equal(mask, [True, True, False, False, True])


def test_score_codes_matches_counter_oracle(rng):
    """n_scored == unique ngram count, n_green == per-unique green hits."""
    spec = make_spec(context_size=2)
    gl = HashGreenlist(spec)
    seq = rng.integers(0, 16, size=64).astype(np.int32)  # small vocab -> dupes
    n_green, n_scored = jax.jit(lambda c: score_codes(spec, gl, c))(jnp.asarray(seq))

    oracle = collections.Counter(oracle_ngrams_linear(list(seq), 2))
    assert int(n_scored) == len(oracle)
    greens = 0
    for ng in oracle:
        ctx, tgt = ng[:-1], ng[-1]
        key = jnp.array(sum(ctx), dtype=jnp.int32)
        greens += int(np.asarray(gl.green_lookup(key, jnp.int32(tgt))))
    assert int(n_green) == greens


def test_pvalue_matches_scipy(rng):
    spec = make_spec()
    gl = HashGreenlist(spec)
    codes = jnp.asarray(rng.integers(0, 512, size=(3, 64)).astype(np.int32))
    pvals = np.asarray(detect(spec, gl, codes))
    for b in range(3):
        n_green, n_scored = score_codes(spec, gl, codes[b])
        n_green, n_scored = int(n_green), int(n_scored)
        expect = special.betainc(n_green, 1 + n_scored - n_green, spec.gamma) if n_green > 0 else 1.0
        # jax betainc runs in float32; scipy in float64.
        assert pvals[b] == pytest.approx(expect, rel=5e-3)


def test_detect_separates_watermarked(rng):
    """Codes drawn preferentially from greenlists must get tiny p-values."""
    spec = make_spec()
    gl = HashGreenlist(spec)
    # Unwatermarked: uniform random
    plain = rng.integers(0, 512, size=(2, 128)).astype(np.int32)
    # Watermarked: greedily pick a green token given previous token.
    # Precompute all greenlists once to keep this test fast.
    all_masks = np.asarray(gl.green_mask(jnp.arange(512, dtype=jnp.int32)))
    wm = np.zeros((2, 128), dtype=np.int32)
    for b in range(2):
        tok = int(rng.integers(0, 512))
        for t in range(128):
            tok = int(rng.choice(np.flatnonzero(all_masks[tok])))
            wm[b, t] = tok
    p_plain = np.asarray(detect(spec, gl, jnp.asarray(plain)))
    p_wm = np.asarray(detect(spec, gl, jnp.asarray(wm)))
    assert (p_wm < 1e-6).all()
    assert (p_plain > 1e-3).all()


def test_detect_is_jittable_and_vmapped(rng):
    spec = make_spec(seed_strategy=SeedStrategy.SPATIAL, context_size=1, spatial_dim=8)
    gl = HashGreenlist(spec)
    codes = jnp.asarray(rng.integers(0, 512, size=(5, 64)).astype(np.int32))
    f = jax.jit(lambda c: detect(spec, gl, c))
    p = np.asarray(f(codes))
    assert p.shape == (5,)
    assert ((p >= 0) & (p <= 1)).all()
