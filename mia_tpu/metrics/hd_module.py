"""FUGC lip-class Hausdorff evaluator (reference ``src/metric/metric.py:9-79``).

``HD(pred_logits, label)`` averages three Hausdorff distances over the
FUGC class structure: anterior lip only (class 2 → bg), posterior lip only
(class 1 → bg, 2 → 1), and the merged object (2 → 1). The reference runs
SimpleITK on the host per call; here each sub-evaluation is the on-device
``cal_hd`` (max symmetric surface distance with the reference's empty-mask
conventions).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops.distance import surface_distance_stats


def cal_hd(a, b, spacing=None) -> float:
    """Reference ``cal_hd`` conventions (``metric/metric.py:82-108``):
    both empty → 0, one empty → inf, else max symmetric surface distance."""
    a = jnp.asarray(a) > 0
    b = jnp.asarray(b) > 0
    sum_a = int(jnp.sum(a))
    sum_b = int(jnp.sum(b))
    if sum_a == 0 and sum_b == 0:
        return 0.0
    if sum_a == 0 or sum_b == 0:
        return float(np.inf)
    stats = surface_distance_stats(a, b, spacing)
    return float(stats["hd"])


class HD:
    """Callable evaluator: logits (B, H, W, C) or (B, C, H, W) + label
    (B, H, W) → mean of (hd_all, hd_upper, hd_lower) for the first case."""

    def __call__(self, pred, label) -> float:
        pred = np.asarray(pred)
        label = np.asarray(label)
        if pred.ndim == 4 and pred.shape[1] <= 8 and pred.shape[1] < pred.shape[-1]:
            pred_map = pred.argmax(1)[0].astype(np.int64)  # channel-first input
        else:
            pred_map = pred.argmax(-1)[0].astype(np.int64)
        label_map = label[0].astype(np.int64)
        return self.evaluation(pred_map, label_map)

    @staticmethod
    def evaluation(pred: np.ndarray, label: np.ndarray) -> float:
        # upper: drop class 2
        pred_upper = np.where(pred == 2, 0, pred)
        label_upper = np.where(label == 2, 0, label)
        hd_upper = cal_hd(pred_upper, label_upper)
        # lower: keep class 2 as 1, drop class 1
        pred_lower = np.where(pred == 1, 0, pred)
        pred_lower = np.where(pred_lower == 2, 1, pred_lower)
        label_lower = np.where(label == 1, 0, label)
        label_lower = np.where(label_lower == 2, 1, label_lower)
        hd_lower = cal_hd(pred_lower, label_lower)
        # all: merge 2 into 1
        pred_all = np.where(pred == 2, 1, pred)
        label_all = np.where(label == 2, 1, label)
        hd_all = cal_hd(pred_all, label_all)
        return (hd_all + hd_lower + hd_upper) / 3.0
