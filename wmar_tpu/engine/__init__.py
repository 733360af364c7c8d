"""Decode engine: KV cache, attention, and the fused watermark scan loop."""

from wmar_tpu.engine.attention import decode_attention, prefill_attention
from wmar_tpu.engine.decode import SamplerConfig, WatermarkRuntime, decode_tokens
from wmar_tpu.engine.kvcache import CacheSpec, KVCache

__all__ = [
    "CacheSpec",
    "KVCache",
    "SamplerConfig",
    "WatermarkRuntime",
    "decode_attention",
    "decode_tokens",
    "prefill_attention",
]
