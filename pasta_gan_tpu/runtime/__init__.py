"""Configs, stats, logging."""

from .config import (
    AdaConfig,
    CFG_SPECS,
    LossConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
    from_preset,
    lazy_reg_scaling,
)
