"""RCC finetuning: curriculum augs, idempotence loss, mesh-parallel trainer."""

from wmar_tpu.finetune.rcc import (
    AUG_LEVELS,
    MaskGitRCCAdapter,
    RCCConfig,
    RCCState,
    TamingRCCAdapter,
    apply_random_augmentation,
    expand_level,
    init_state,
    make_optimizer,
    make_train_step,
    make_val_step,
    validation_l0,
)

__all__ = [
    "AUG_LEVELS",
    "MaskGitRCCAdapter",
    "RCCConfig",
    "RCCState",
    "TamingRCCAdapter",
    "apply_random_augmentation",
    "expand_level",
    "init_state",
    "make_optimizer",
    "make_train_step",
    "make_val_step",
    "validation_l0",
]
