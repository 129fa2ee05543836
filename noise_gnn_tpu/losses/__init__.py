"""Noise-robust losses: co-teaching, CoDis, backward correction, consistency,
contrastive — all static-shape, on-device (reference: src/utils/losses.py,
src/utils/data_utils.py).
"""

from .coteaching import (
    ct_loss,
    codi_loss,
    ct_loss2,
    backward_correction,
    cross_entropy,
    small_loss_selection,
)
from .consistency import entropy, get_uncertainty, fix_cr, neighbor_align, ce_loss
from .contrastive import (
    kl_divergence,
    jensen_shannon,
    discriminator_innerprod,
    discriminator_innerprod2,
    bce_expert_loss,
    bce_expert_loss2,
    topk_accuracy,
)
from .schedules import forget_rate_schedule

__all__ = [
    "ct_loss",
    "codi_loss",
    "ct_loss2",
    "backward_correction",
    "cross_entropy",
    "small_loss_selection",
    "entropy",
    "get_uncertainty",
    "fix_cr",
    "neighbor_align",
    "ce_loss",
    "kl_divergence",
    "jensen_shannon",
    "discriminator_innerprod",
    "bce_expert_loss",
    "topk_accuracy",
    "discriminator_innerprod2",
    "bce_expert_loss2",
    "forget_rate_schedule",
]
