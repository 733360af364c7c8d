"""Weight-only int8 quantization for decode-path linears.

Serving lever shared by the autoregressive decode families (RAR, taming
minGPT, Chameleon Llama): per-output-channel absmax int8 weights with the
scale factored out of the contraction, so the matmul runs on the int8
operand (XLA fuses the int8->bf16 convert into the operand read) and the
weights stream from HBM at half the bf16 bytes. Decode is HBM-bandwidth
bound on TPU, so weight bytes are a first-order cost at small batch.

Quantized tensors stay ordinary pytree leaves (a dict of ``q``/``s`` or
``w_q``/``w_scale``/``b``), so they shard, donate, and jit like any other
params — TP specs extend naturally (scales are per-output-channel, so they
shard with the output dim).

This is the TPU-native counterpart of serving-side weight quantization the
reference leaves to external runtimes; it is opt-in and its token drift is
measured (greedy-agreement tests + PERFORMANCE.md), never assumed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quantize_matrix_int8(w) -> dict:
    """Bare matrix ``[n_in, n_out]`` -> ``{"q": int8, "s": bf16 [n_out]}``.

    Per-output-channel absmax: each column's quantization step is <= 0.8% of
    its own range (127 levels), and because the scale is per-*output*
    channel it commutes with the contraction: ``x @ w == (x @ q) * s``.
    """
    w = np.asarray(jax.device_get(w), np.float32)
    scale = np.abs(w).max(axis=0) / 127.0
    q = np.clip(np.round(w / np.maximum(scale, 1e-12)), -127, 127).astype(np.int8)
    return {"q": jnp.asarray(q), "s": jnp.asarray(scale, jnp.bfloat16)}


@jax.jit
def _quantize_on_device(w):
    w32 = w.astype(jnp.float32)
    scale = jnp.abs(w32).max(axis=0) / 127.0
    q = jnp.clip(jnp.round(w32 / jnp.maximum(scale, 1e-12)), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.bfloat16)


def quantize_matrix_int8_device(w) -> dict:
    """Same math as :func:`quantize_matrix_int8` but entirely on-device.

    The host variant round-trips every matrix through ``device_get`` — at 7B
    that is ~14 GB over the (possibly tunneled) link; this jitted version
    keeps the bytes in HBM. Results agree to the float32 rounding of the
    same formula (both compute in f32)."""
    q, s = _quantize_on_device(jnp.asarray(w))
    return {"q": q, "s": s}


def quantize_linear_int8(p: dict, compute_dtype=None) -> dict:
    """``{"w","b"}`` -> ``{"w_q","w_scale","b"}`` (host-side numpy)."""
    qs = quantize_matrix_int8(p["w"])
    b = jnp.asarray(p["b"])
    if compute_dtype is not None:
        b = b.astype(compute_dtype)
    return {"w_q": qs["q"], "w_scale": qs["s"], "b": b}


def matmul(x, w):
    """``x @ w`` where ``w`` is a bare matrix or a ``{"q","s"}`` quant dict."""
    if isinstance(w, dict):
        return (x @ w["q"].astype(x.dtype)) * w["s"].astype(x.dtype)
    return x @ w


def linear(x, p: dict):
    """Linear layer on a ``{"w","b"}`` or ``{"w_q","w_scale","b"}`` pytree."""
    if "w_q" in p:
        y = x @ p["w_q"].astype(x.dtype)
        return y * p["w_scale"].astype(x.dtype) + p["b"]
    return x @ p["w"] + p["b"]


def cast_float_leaves(tree, compute_dtype):
    """Cast floating leaves to ``compute_dtype``; int8 leaves untouched.

    Embedding/norm dtype seeds the activation dtype of every downstream
    matmul, so serving configs cast the non-quantized remainder to bf16.
    """

    def cast(x):
        x = jnp.asarray(x)
        return x.astype(compute_dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x

    return jax.tree.map(cast, tree)
