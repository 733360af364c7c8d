"""Audio watermarking case study: Mimi codec + Moshi LM + samplers +
conditioners."""

from wmar_tpu.audio.conditioners import (
    ConditionFuser,
    ConditionProvider,
    LUTConditionerConfig,
    cfg_pair,
    convert_conditioners,
    init_lut_params,
    lut_condition,
    tokenize_lut,
)
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
    "ConditionFuser",
    "ConditionProvider",
    "LUTConditionerConfig",
    "cfg_pair",
    "convert_conditioners",
    "init_lut_params",
    "lut_condition",
    "tokenize_lut",
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
