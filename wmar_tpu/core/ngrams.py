"""N-gram extraction over token streams and token grids — fully vectorized.

The reference builds Python tuples with ``itertools``/``collections.Counter``
on the host per image (``gentime_watermark.py:33-88,285-318``). Here n-grams
are static-shaped gathers so detection jits and vmaps over batches:

* linear n-grams: sliding windows over the 1-D token stream,
* spatial n-grams: neighbor gathers over the ``dim x dim`` token grid
  (h=1: left neighbor, or the cell above at a row start; h=3: the 2x2-block
  contexts top-left/top-right/bottom-left with target bottom-right),

matching the reference's ``ngrams``/``spatial_ngrams`` iteration order and
coverage exactly.

Deduplication (the reference's ``Counter`` over ngram tuples) is an
O(N^2 * (h+1)) boolean comparison matrix — N <= 1024 tokens, so ~4M VPU ops,
negligible on TPU and trivially jittable.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from wmar_tpu.core.spec import SeedStrategy, WatermarkSpec


def linear_ngrams(codes: jnp.ndarray, h: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sliding (h+1)-grams over a 1-D token stream.

    Args:
      codes: int32 ``[T]`` token stream.
      h: context size (>= 1).

    Returns:
      ``(rows [N, h+1], keys [N], targets [N])`` with ``N = T - h``;
      ``keys`` is the context sum (the greenlist seed key), ``targets`` the
      final token of each window.
    """
    t = codes.shape[0]
    n = t - h
    if n < 1:
        raise ValueError(f"Need at least {h + 1} tokens, got {t}")
    idx = jnp.arange(n)[:, None] + jnp.arange(h + 1)[None, :]
    rows = codes[idx]  # [N, h+1]
    keys = rows[:, :h].sum(axis=1, dtype=jnp.int32)
    return rows, keys, rows[:, h]


def spatial_ngrams(codes: jnp.ndarray, h: int, dim: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Spatial (h+1)-grams over a row-major ``dim x dim`` token grid.

    h=1: for every cell except (0,0), context = left neighbor, or the cell
    above when in column 0 (N = dim^2 - 1).
    h=3: for every 2x2 block, context = (top-left, top-right, bottom-left),
    target = bottom-right (N = (dim-1)^2).
    """
    grid = codes.reshape(dim, dim)
    if h == 1:
        # Row-major order of the reference generator: (i, j) for all cells
        # but (0,0); context above when j == 0 else left.
        above = jnp.roll(grid, 1, axis=0)
        left = jnp.roll(grid, 1, axis=1)
        j_is_zero = (jnp.arange(dim) == 0)[None, :]
        ctx = jnp.where(j_is_zero, above, left).reshape(-1)
        tgt = grid.reshape(-1)
        # Drop (0,0): static slice off the first element.
        ctx, tgt = ctx[1:], tgt[1:]
        rows = jnp.stack([ctx, tgt], axis=1)
        return rows, ctx.astype(jnp.int32), tgt
    if h == 3:
        tl = grid[:-1, :-1].reshape(-1)
        tr = grid[:-1, 1:].reshape(-1)
        bl = grid[1:, :-1].reshape(-1)
        br = grid[1:, 1:].reshape(-1)
        rows = jnp.stack([tl, tr, bl, br], axis=1)
        keys = (tl + tr + bl).astype(jnp.int32)
        return rows, keys, br
    raise ValueError("spatial n-grams support h in {1, 3} (2x1 and 2x2 blocks)")


def extract_ngrams(spec: WatermarkSpec, codes: jnp.ndarray):
    """Dispatch on the seed strategy. FIXED scores every token with key 0."""
    if spec.seed_strategy == SeedStrategy.SPATIAL:
        return spatial_ngrams(codes, spec.context_size, spec.spatial_dim)
    if spec.seed_strategy == SeedStrategy.LINEAR:
        return linear_ngrams(codes, spec.context_size)
    # FIXED: context size h windows still define dedup granularity in the
    # reference (ngrams of size h+1 with h possibly 0).
    h = spec.context_size
    if h == 0:
        rows = codes[:, None]
        keys = jnp.zeros_like(codes, dtype=jnp.int32)
        return rows, keys, codes
    rows, _, targets = linear_ngrams(codes, h)
    return rows, jnp.zeros_like(targets, dtype=jnp.int32), targets


def first_occurrence_mask(rows: jnp.ndarray) -> jnp.ndarray:
    """``mask[i]`` is True iff row ``i`` is the first occurrence of its value.

    Equivalent to the reference's ``Counter`` dedup over ngram tuples:
    each *unique* ngram is scored once.
    """
    eq = (rows[:, None, :] == rows[None, :, :]).all(axis=-1)  # [N, N]
    n = rows.shape[0]
    earlier = jnp.tril(jnp.ones((n, n), dtype=bool), k=-1)
    return ~(eq & earlier).any(axis=1)
