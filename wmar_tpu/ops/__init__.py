"""Pallas TPU kernels + XLA-native equivalents of the reference's CUDA ops."""

from wmar_tpu.ops.flash_decode import flash_decode_attention
from wmar_tpu.ops.upfirdn import fused_bias_act, upfirdn2d

__all__ = ["flash_decode_attention", "fused_bias_act", "upfirdn2d"]
