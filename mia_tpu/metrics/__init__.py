from .metrics import (
    dice_coefficient,
    jaccard,
    metric_percase,
    metric_percase_hd95,
    per_class_metrics,
)

__all__ = [
    "dice_coefficient",
    "jaccard",
    "metric_percase",
    "metric_percase_hd95",
    "per_class_metrics",
]
