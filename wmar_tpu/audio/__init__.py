"""Audio watermarking case study: Mimi codec + Moshi-style LM + samplers."""

from wmar_tpu.audio.lm import MoshiConfig, MoshiGen, WMConfig, init_moshi_params
from wmar_tpu.audio.mimi import MIMI_V0_1, Mimi, MimiConfig
from wmar_tpu.audio.wm import (
    gumbel_sample,
    gumbel_score,
    maryland_green,
    maryland_sample,
    pvalue_gumbel,
    pvalue_maryland,
    score_stream_maryland,
    window_hash,
    wm_sample_token,
)

__all__ = [
    "MIMI_V0_1",
    "Mimi",
    "MimiConfig",
    "MoshiConfig",
    "MoshiGen",
    "WMConfig",
    "gumbel_sample",
    "gumbel_score",
    "init_moshi_params",
    "maryland_green",
    "maryland_sample",
    "pvalue_gumbel",
    "pvalue_maryland",
    "score_stream_maryland",
    "window_hash",
    "wm_sample_token",
]
