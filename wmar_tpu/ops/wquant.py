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


INT4_GROUP = 128


def quantize_matrix_int4(w, group: int = INT4_GROUP) -> dict:
    """Bare matrix ``[n_in, n_out]`` -> ``{"q4": uint8 [gc, G/2, n_out],
    "s4": bf16 [gc, n_out]}`` — grouped int4, two nibbles per byte.

    int4 has 15 levels, far too coarse for a whole-column absmax, so the
    contraction axis is cut into groups of ``group`` rows and each
    (group, output-channel) cell gets its own scale — the standard
    group-wise weight-quantization recipe (cf. GPTQ/AWQ serving layouts).
    Because the scale now varies ALONG the contraction it cannot be
    factored out of one big dot; :func:`matmul` instead runs one batched
    dot per group and applies the scales to the partial sums, which keeps
    the uint8 nibbles as the HBM-resident operand (the whole point: decode
    is weight-read bound, int4 halves the int8 byte stream again).

    Nibble encoding: values in [-7, 7] stored offset-8 in [1, 15]; byte row
    i of a group holds rows i (low nibble) and i + G/2 (high nibble) — the
    "group halves" layout, so unpacking is a single sublane concatenation
    (no interleave): both XLA (round-3 KV measurement: de-interleaved 21.5
    vs interleaved 13.0 imgs/s) and the Pallas w4 kernel
    (`ops/w4_matmul.py`) want it this way. uint8 storage with int32
    widening before any bit op (TPU-friendly; see PERFORMANCE.md's
    Mosaic/XLA int-width notes).
    """
    w = np.asarray(jax.device_get(w), np.float32)
    n_in, n_out = w.shape
    if n_in % group or group % 2:
        raise ValueError(f"n_in={n_in} must be divisible by even group={group}")
    gc = n_in // group
    wg = w.reshape(gc, group, n_out)
    scale = np.abs(wg).max(axis=1) / 7.0  # [gc, n_out]
    q = np.clip(np.round(wg / np.maximum(scale[:, None, :], 1e-12)), -7, 7)
    u = (q + 8).astype(np.uint8)  # [gc, G, n_out] in [1, 15]
    half = group // 2
    packed = (u[:, :half, :] | (u[:, half:, :] << 4)).astype(np.uint8)
    return {"q4": jnp.asarray(packed), "s4": jnp.asarray(scale, jnp.bfloat16)}


@jax.jit
def _quantize_on_device4(wg):
    w32 = wg.astype(jnp.float32)  # [gc, G, n_out]
    scale = jnp.abs(w32).max(axis=1) / 7.0
    q = jnp.clip(jnp.round(w32 / jnp.maximum(scale[:, None, :], 1e-12)), -7, 7)
    u = (q.astype(jnp.int32) + 8)
    half = wg.shape[1] // 2
    packed = (u[:, :half, :] | (u[:, half:, :] << 4)).astype(jnp.uint8)
    return packed, scale.astype(jnp.bfloat16)


def quantize_matrix_int4_device(w, group: int = INT4_GROUP) -> dict:
    """On-device variant of :func:`quantize_matrix_int4` (no host roundtrip
    — same rationale as :func:`quantize_matrix_int8_device`)."""
    w = jnp.asarray(w)
    n_in, n_out = w.shape
    if n_in % group or group % 2:
        raise ValueError(f"n_in={n_in} must be divisible by even group={group}")
    q4, s4 = _quantize_on_device4(w.reshape(n_in // group, group, n_out))
    return {"q4": q4, "s4": s4}


def unpack_int4(q4):
    """``[gc, G/2, n_out]`` packed nibbles -> ``[gc, G, n_out]`` int32 in
    [-7, 7]. Group-halves layout: low nibbles are rows [0, G/2), high are
    [G/2, G), so unpacking is one concatenation (no interleave). Widen to
    int32 BEFORE the bit ops (uint8 bit ops lower badly)."""
    b = q4.astype(jnp.int32)
    lo = (b & 15) - 8
    hi = (b >> 4) - 8
    return jnp.concatenate([lo, hi], axis=1)


def matmul4(x, w: dict):
    """``x @ dequant(w)`` for a ``{"q4","s4"}`` grouped-int4 dict.

    Default route is the XLA grouped dot (`matmul4_xla`): with the
    group-halves layout XLA fuses the concat-unpack into the contraction
    and matches the int8 route per-layer (tools/bench_w4.py, round 4).
    The Pallas w4a16 kernel (`ops/w4_matmul.py`) is opt-in via
    WMAR_W4_KERNEL=1 — it measured ~2x slower on the tunneled v5e (VPU
    unpack outweighs the halved HBM bytes) but may flip on
    directly-attached chips.
    """
    from wmar_tpu.ops.w4_matmul import matmul_w4_pallas, w4_kernel_eligible

    if w4_kernel_eligible(x.shape, w["q4"].shape):
        return matmul_w4_pallas(x, w["q4"], w["s4"])
    return matmul4_xla(x, w)


def matmul4_xla(x, w: dict):
    """XLA fallback for :func:`matmul4` (kept callable for benchmarking)."""
    qf = unpack_int4(w["q4"]).astype(x.dtype)        # [gc, G, n_out]
    gc, group, n_out = qf.shape
    lead = x.shape[:-1]
    xg = x.reshape(-1, gc, group).transpose(1, 0, 2)  # [gc, M, G]
    yg = jax.lax.dot_general(
        xg, qf, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [gc, M, n_out] f32 partials
    y = (yg * w["s4"].astype(jnp.float32)[:, None, :]).sum(axis=0)
    return y.astype(x.dtype).reshape(*lead, n_out)


def _int4_group_for(n_in: int) -> int | None:
    """Largest supported group size dividing ``n_in`` (None -> use int8)."""
    for g in (INT4_GROUP, 64, 32):
        if n_in % g == 0:
            return g
    return None


def quantize_matrix(w, bits: int = 8, device: bool = False) -> dict:
    """Bits-dispatching matrix quantizer: ``bits=8`` -> ``{"q","s"}``,
    ``bits=4`` -> grouped ``{"q4","s4"}`` (falls back to int8 when no
    supported group divides the contraction dim)."""
    if bits == 4:
        g = _int4_group_for(int(w.shape[0]))
        if g is not None:
            fn = quantize_matrix_int4_device if device else quantize_matrix_int4
            return fn(w, group=g)
    return quantize_matrix_int8_device(w) if device else quantize_matrix_int8(w)


def quantize_linear(p: dict, bits: int = 8, compute_dtype=None) -> dict:
    """Bits-dispatching ``{"w","b"}`` quantizer (int4 falls back to int8 on
    indivisible input dims, mirroring :func:`quantize_matrix`)."""
    if bits == 4 and _int4_group_for(int(jnp.shape(p["w"])[0])) is not None:
        return quantize_linear_int4(p, compute_dtype=compute_dtype,
                                    group=_int4_group_for(int(jnp.shape(p["w"])[0])))
    return quantize_linear_int8(p, compute_dtype=compute_dtype)


def quantize_linear_int4(p: dict, compute_dtype=None, group: int = INT4_GROUP) -> dict:
    """``{"w","b"}`` -> ``{"w_q4","w_s4","b"}`` (host-side numpy)."""
    qs = quantize_matrix_int4(p["w"], group=group)
    b = jnp.asarray(p["b"])
    if compute_dtype is not None:
        b = b.astype(compute_dtype)
    return {"w_q4": qs["q4"], "w_s4": qs["s4"], "b": b}


def matmul(x, w):
    """``x @ w`` where ``w`` is a bare matrix, a ``{"q","s"}`` int8 dict, or
    a ``{"q4","s4"}`` grouped-int4 dict."""
    if isinstance(w, dict):
        if "q4" in w:
            return matmul4(x, w)
        return (x @ w["q"].astype(x.dtype)) * w["s"].astype(x.dtype)
    return x @ w


def linear(x, p: dict):
    """Linear layer on ``{"w","b"}``, ``{"w_q","w_scale","b"}`` (int8), or
    ``{"w_q4","w_s4","b"}`` (grouped int4) pytrees."""
    if "w_q4" in p:
        return matmul4(x, {"q4": p["w_q4"], "s4": p["w_s4"]}) + p["b"]
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
