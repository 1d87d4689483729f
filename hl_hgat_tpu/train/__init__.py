"""Training layer: losses, metrics, optimizers, loop, checkpointing.

Replaces the reference's per-script argparse training loops (reference
main_*.py, SURVEY.md §2.7) with one jitted trainer: Adam with torch-style L2,
ReduceLROnPlateau, best-metric checkpoint gating, and orbax persistence of
the full training state (the reference never saved optimizer state — no true
resume, SURVEY.md §5).
"""

from hl_hgat_tpu.train.losses import (
    bce_logits_loss,
    focal_loss,
    l1_loss,
    mse_loss,
    soft_dice_loss,
    softmax_ce_loss,
    weighted_mse_loss,
)
from hl_hgat_tpu.train.metrics import (
    accuracy,
    average_precision,
    mae,
    pearson_corr,
    per_graph_binary_f1,
)
from hl_hgat_tpu.train.optim import ReduceLROnPlateau, adam_l2
from hl_hgat_tpu.train.trainer import TrainState, Trainer, TrainerConfig

__all__ = [
    "l1_loss",
    "mse_loss",
    "softmax_ce_loss",
    "bce_logits_loss",
    "focal_loss",
    "soft_dice_loss",
    "weighted_mse_loss",
    "mae",
    "accuracy",
    "per_graph_binary_f1",
    "average_precision",
    "pearson_corr",
    "adam_l2",
    "ReduceLROnPlateau",
    "TrainState",
    "Trainer",
    "TrainerConfig",
]
