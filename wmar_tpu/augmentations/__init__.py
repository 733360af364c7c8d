"""Robustness attack bank: jittable geometric/valuemetric transforms."""

from wmar_tpu.augmentations.manager import AugmentationManager

__all__ = ["AugmentationManager"]
