"""Pallas w4a16 matmul: grouped-int4 weights dequantized in VMEM.

The standard weight-only-quant serving kernel (cf. GPTQ/AWQ w4a16 CUDA
kernels): stream the packed nibbles HBM->VMEM, widen/unpack/scale on the
VPU, and feed the MXU a bf16 tile that never exists in HBM. Weight
traffic is 0.5 byte/param + bf16 group scales (1/128th).

MEASURED OUTCOME (round 4, tools/bench_w4.py on the v5e with the tunnel
call floor amortized out): the original `BENCH_W=int4` 3x slowdown was
the *interleaved* nibble layout defeating XLA fusion, not HBM
materialization — with the group-halves layout the XLA grouped route
(`wquant.matmul4_xla`) matches int8 per-layer (~43 vs ~45 us at
12x4096x11008), while THIS kernel runs ~2x slower (~103 us): the VPU
widen/unpack costs more than the halved bytes on this chip, mirroring
the round-3 int4-KV finding. The kernel is therefore OPT-IN
(WMAR_W4_KERNEL=1) pending directly-attached-chip re-evaluation; the
XLA route is the default.

Layout contract (shared with `wquant.quantize_matrix_int4`): packed
``[gc, G/2, N]`` uint8 in the group-halves encoding — byte row i of a
group holds original rows i (low nibble) and i + G/2 (high nibble) — so
the in-kernel unpack is a single sublane concatenation, and scales
``[gc, N]`` bf16 per (group, output-channel).

The reference leaves serving-side quantization to external runtimes;
this is the TPU-native counterpart (cf. GPTQ/AWQ w4a16 CUDA kernels).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w4_kernel(x_ref, q_ref, s_ref, o_ref):
    # x_ref [M, K] bf16 · q_ref [gc, G/2, TN] uint8 · s_ref [gc, TN] bf16
    # -> o_ref [M, TN] f32
    b = q_ref[...].astype(jnp.int32)          # widen BEFORE bit ops (Mosaic)
    lo = (b & 15) - 8                          # rows [0, G/2) of each group
    hi = (b >> 4) - 8                          # rows [G/2, G)
    wq = jnp.concatenate([lo, hi], axis=1)     # [gc, G, TN] int32
    # scale in bf16: int4 quant noise (half-step ~7%) dwarfs bf16 rounding
    wf = wq.astype(jnp.bfloat16) * s_ref[...][:, None, :]
    gc, group, tn = wf.shape
    wf = wf.reshape(gc * group, tn)            # [K, TN] — never hits HBM
    o_ref[...] = jnp.dot(x_ref[...], wf, preferred_element_type=jnp.float32)


def _pick_tile(n: int, k: int) -> int | None:
    """Largest lane tile that divides N and keeps the unpacked [K, TN]
    bf16 strip + int32 temporaries comfortably inside VMEM."""
    env = os.environ.get("WMAR_W4_TN")
    if env:
        return int(env)
    budget = 6 * 1024 * 1024  # bytes for the bf16 strip (temps fuse on VPU)
    for tn in (512, 256, 128):
        if n % tn == 0 and k * tn * 2 <= budget:
            return tn
    return None


@functools.partial(jax.jit, static_argnames=("interpret",))
def _matmul_w4_2d(x, packed, scales, interpret=False):
    gc, half, n = packed.shape
    k = gc * half * 2
    m = x.shape[0]
    tn = _pick_tile(n, k)
    assert tn is not None, "caller guarantees a valid tile"
    # pad M to the bf16 sublane tile so tiny decode batches lower cleanly
    mp = max(8, -(-m // 8) * 8)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    out = pl.pallas_call(
        _w4_kernel,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((mp, k), lambda j: (0, 0)),
            pl.BlockSpec((gc, half, tn), lambda j: (0, 0, j)),
            pl.BlockSpec((gc, tn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((mp, tn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), packed, scales.astype(jnp.bfloat16))
    return out[:m]


def w4_kernel_eligible(x_shape, packed_shape) -> bool:
    """Kernel preconditions: lane-tileable N, VMEM-fitting K strip, and a
    single-device real TPU backend — a bare pallas_call has no GSPMD
    partitioning rule, so TP/dp-sharded weight dicts must keep the XLA
    route (same convention as the packed decode kernels,
    `engine/attention.py`). Tests force interpret mode instead.

    OPT-IN (WMAR_W4_KERNEL=1): measured on the v5e (tools/bench_w4.py,
    tunnel floor subtracted), the kernel runs ~2x SLOWER than the XLA
    grouped route at Llama/Taming decode shapes — with the group-halves
    layout XLA fuses the concat-unpack into the dot (u8-grouped ==
    int8 per-layer), and the kernel's VPU widen/unpack costs more than
    the halved HBM bytes, the same tradeoff as the round-3 int4 KV
    measurement. Kept for directly-attached-chip re-evaluation."""
    gc, half, n = packed_shape
    k = gc * half * 2
    if _pick_tile(n, k) is None:
        return False
    knob = os.environ.get("WMAR_W4_KERNEL", "0")
    if knob == "0":
        return False
    if os.environ.get("WMAR_W4_INTERPRET") == "1":
        return True
    return jax.default_backend() == "tpu" and jax.device_count() == 1


def matmul_w4_pallas(x, packed, scales):
    """``x[..., K] @ dequant(packed, scales) -> [..., N]`` in ``x.dtype``.

    ``packed``/``scales`` per the `wquant.quantize_matrix_int4` layout.
    Callers should gate on :func:`w4_kernel_eligible`; this function
    assumes the shapes qualify.
    """
    interpret = os.environ.get("WMAR_W4_INTERPRET") == "1"
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    y = _matmul_w4_2d(x2, packed, scales, interpret=interpret)
    return y.astype(x.dtype).reshape(*lead, packed.shape[-1])
