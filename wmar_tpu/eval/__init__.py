"""Evaluation: generation/attack/detection sweeps + result aggregation."""

from wmar_tpu.eval.pipeline import (
    EvalParams,
    compute_and_save_batch,
    fill_batch_log,
    generate_and_evaluate,
)

__all__ = [
    "EvalParams",
    "compute_and_save_batch",
    "fill_batch_log",
    "generate_and_evaluate",
]
