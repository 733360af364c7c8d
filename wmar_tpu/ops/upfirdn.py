"""upfirdn2d + fused bias/activation: the reference's only native kernels.

The reference vendors two CUDA extensions
(``deps/saberi_wmr/DiffPure/score_sde/op/{upfirdn2d,fused_bias_act}``) used
by StyleGAN2-style layers in the score-SDE DiffPure variant. On TPU these
are expressed as XLA primitives — upsample (dilation) -> FIR conv ->
downsample (stride) compiles to ONE fused convolution, and bias+activation
fuses into the preceding op automatically; hand-written kernels exist in the
reference only because eager PyTorch cannot fuse them.

Layout: NHWC, kernel [kh, kw].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int = 1,
    down: int = 1,
    pad=(0, 0),
) -> jnp.ndarray:
    """Upsample by ``up`` (zero insertion), FIR filter, downsample by ``down``.

    ``x [B, H, W, C]``, ``kernel [kh, kw]`` applied per channel, ``pad``
    = (pad0, pad1) applied before filtering on both spatial dims — the
    semantics of the reference's ``upfirdn2d`` op.
    """
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad
    k = jnp.asarray(kernel, jnp.float32)[::-1, ::-1]  # correlation vs convolution
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # [kh, kw, 1, C]
    dn = jax.lax.conv_dimension_numbers(x.shape, kern.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        kern,
        window_strides=(down, down),
        # lhs_dilation gives (n-1)*up+1 samples; upfirdn's upsampling is
        # n*up (trailing zeros), so extend the right/bottom padding.
        padding=((pad0, pad1 + up - 1), (pad0, pad1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=dn,
        feature_group_count=c,
    ).astype(x.dtype)


def fused_bias_act(
    x: jnp.ndarray,
    bias=None,
    act: str = "lrelu",
    alpha: float = 0.2,
    gain: float = 2**0.5,
) -> jnp.ndarray:
    """bias + activation + gain in one expression (XLA fuses it into the
    producer op; the reference needs ``fused_bias_act_kernel.cu`` for this)."""
    if bias is not None:
        x = x + bias
    if act == "lrelu":
        x = jnp.where(x >= 0, x, alpha * x)
    elif act == "relu":
        x = jnp.maximum(x, 0)
    elif act == "linear":
        pass
    else:
        raise ValueError(act)
    return x * gain if gain != 1.0 else x
