"""Training: losses, on-device augmentation, supervised + contrastive loops."""

from cut_detection_tpu.train.losses import (
    ContrastiveLoss,
    cross_entropy_sum,
    ntxent_loss,
)

__all__ = ["ContrastiveLoss", "cross_entropy_sum", "ntxent_loss"]
