from .dice import soft_dice_loss, memory_efficient_soft_dice_loss, get_tp_fp_fn_tn
from .ce import (
    cross_entropy,
    robust_cross_entropy,
    topk_loss,
    bce_with_logits,
)
from .compound import (
    DiceAndCELoss,
    DualBranchDiceAndCELoss,
    DCAndCELoss,
    DCAndBCELoss,
    DCAndTopKLoss,
)
from .contrastive import prototype_contrastive_loss
from .vat import vat_loss

__all__ = [
    "soft_dice_loss",
    "memory_efficient_soft_dice_loss",
    "get_tp_fp_fn_tn",
    "cross_entropy",
    "robust_cross_entropy",
    "topk_loss",
    "bce_with_logits",
    "DiceAndCELoss",
    "DualBranchDiceAndCELoss",
    "DCAndCELoss",
    "DCAndBCELoss",
    "DCAndTopKLoss",
    "prototype_contrastive_loss",
    "vat_loss",
]
