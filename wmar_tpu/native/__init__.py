"""Native host runtime: C++ detection kernel with ctypes binding.

Compiled on demand with the system toolchain (g++ -O3) and cached next to
the source; falls back to the JAX implementation when no compiler is
available. See ``ngram_scorer.cpp`` for what it replaces in the reference.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ngram_scorer.cpp")
_LIB_PATH = os.path.join(_HERE, "_ngram_scorer.so")
_lib = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if _build_failed:
        return None
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        for cxx in ("g++", "c++", "clang++"):
            try:
                subprocess.run(
                    [cxx, "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB_PATH],
                    check=True,
                    capture_output=True,
                )
                break
            except (OSError, subprocess.CalledProcessError):
                continue
        else:
            _build_failed = True
            return None
    return ctypes.CDLL(_LIB_PATH)


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None:
        _lib = _build()
        if _lib is not None:
            i64, i32, u32 = ctypes.c_int64, ctypes.c_int, ctypes.c_uint32
            p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C")
            p_u32 = np.ctypeslib.ndpointer(np.uint32, flags="C")
            p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C")
            _lib.score_codes_table.argtypes = [
                p_i32, i64, i64, i32, i32, i32, p_u32, i64, i64, i32, p_i64,
            ]
            _lib.score_codes_hash.argtypes = [
                p_i32, i64, i64, i32, i32, i32, p_u32, u32, i32, p_i64,
            ]
            _lib.score_codes_keymap.argtypes = [
                p_i32, i64, i64, i32, i32, i32, p_i64, i64, p_u32, i64, p_i64,
            ]
    return _lib


def available() -> bool:
    return get_lib() is not None


def context_keys_np(spec, codes: np.ndarray) -> np.ndarray:
    """All greenlist context keys appearing in ``codes [B, T]`` — pure numpy
    mirror of :mod:`wmar_tpu.core.ngrams` key rules (sums of context
    windows), used to pre-build lazy greenlist rows for the native scorer."""
    from wmar_tpu.core.spec import SeedStrategy

    codes = np.asarray(codes, dtype=np.int64)
    if codes.ndim == 1:
        codes = codes[None]
    h = spec.context_size
    if spec.seed_strategy == SeedStrategy.FIXED:
        return np.zeros((1,), np.int64)
    if spec.seed_strategy == SeedStrategy.SPATIAL:
        d = spec.spatial_dim
        grid = codes.reshape(codes.shape[0], d, d)
        if h == 1:
            above = np.roll(grid, 1, axis=1)
            left = np.roll(grid, 1, axis=2)
            ctx = np.where((np.arange(d) == 0)[None, None, :], above, left)
            return ctx.reshape(codes.shape[0], -1)[:, 1:].reshape(-1)
        if h == 3:
            tl = grid[:, :-1, :-1]
            tr = grid[:, :-1, 1:]
            bl = grid[:, 1:, :-1]
            return (tl + tr + bl).reshape(-1)
        raise ValueError("spatial keys support h in {1, 3}")
    # LINEAR: sliding h-window sums.
    t = codes.shape[1]
    csum = np.concatenate([np.zeros((codes.shape[0], 1), np.int64),
                           np.cumsum(codes, axis=1)], axis=1)
    return (csum[:, h:t] - csum[:, 0:t - h]).reshape(-1)


def score_codes_native(spec, greenlist, codes: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Batched (n_green, n_scored) on the host via the C++ kernel.

    Matches :func:`wmar_tpu.core.detect.score_codes` exactly for both
    greenlist sources; raises ``RuntimeError`` if no compiler is available.
    """
    from wmar_tpu.core.greenlist import (
        HashGreenlist,
        LazyTorchCompatGreenlist,
        TableGreenlist,
        pack_bool_rows,
    )
    from wmar_tpu.core.spec import SeedStrategy

    lib = get_lib()
    if lib is None:
        raise RuntimeError("no C++ compiler available for the native scorer")
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    batch, t = codes.shape
    spatial = 1 if spec.seed_strategy == SeedStrategy.SPATIAL else 0
    fixed = 1 if spec.seed_strategy == SeedStrategy.FIXED else 0
    h = spec.context_size
    out = np.zeros((batch, 2), dtype=np.int64)

    if isinstance(greenlist, LazyTorchCompatGreenlist):
        # Build packed rows for exactly the context keys present in this
        # batch (row construction = the torch-compat randperm, cached in the
        # greenlist's LRU); the C++ kernel binary-searches the key map.
        # FIXED seeding has one row for every key — use the table kernel
        # with fixed_key so arbitrary context sums map to it.
        uniq = np.unique(context_keys_np(spec, codes))
        rows = np.stack([greenlist._row(int(k)) for k in uniq])
        table = np.ascontiguousarray(pack_bool_rows(rows), dtype=np.uint32)
        if fixed:
            lib.score_codes_table(
                codes, batch, t, h, spatial, spec.spatial_dim,
                table, 1, table.shape[1], 1, out,
            )
        else:
            lib.score_codes_keymap(
                codes, batch, t, h, spatial, spec.spatial_dim,
                np.ascontiguousarray(uniq, dtype=np.int64), len(uniq),
                table, table.shape[1], out,
            )
    elif isinstance(greenlist, TableGreenlist):
        table = np.ascontiguousarray(np.asarray(greenlist._table), dtype=np.uint32)
        lib.score_codes_table(
            codes, batch, t, h, spatial, spec.spatial_dim,
            table, table.shape[0], table.shape[1], fixed, out,
        )
    elif isinstance(greenlist, HashGreenlist):
        if greenlist._fixed_mask is not None:
            table = pack_bool_rows(np.asarray(greenlist._fixed_mask)[None, :])
            table = np.ascontiguousarray(table, dtype=np.uint32)
            lib.score_codes_table(
                codes, batch, t, h, spatial, spec.spatial_dim,
                table, 1, table.shape[1], 1, out,
            )
        else:
            thr = np.ascontiguousarray(np.asarray(greenlist._thresholds), dtype=np.uint32)
            lib.score_codes_hash(
                codes, batch, t, h, spatial, spec.spatial_dim,
                thr, np.uint32(spec.salt_key & 0xFFFFFFFF), fixed, out,
            )
    else:
        raise TypeError(type(greenlist))
    return out[:, 0], out[:, 1]


def detect_native(spec, greenlist, codes: np.ndarray) -> np.ndarray:
    """Host detection: codes [B, T] -> p-values [B] (scipy betainc)."""
    from scipy import special

    n_green, n_scored = score_codes_native(spec, greenlist, codes)
    pvals = np.ones(len(n_green))
    pos = n_green > 0
    pvals[pos] = special.betainc(n_green[pos], 1 + n_scored[pos] - n_green[pos], spec.gamma)
    return pvals
