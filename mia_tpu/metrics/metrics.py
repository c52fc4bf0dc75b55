"""On-device segmentation metrics with reference empty-mask conventions.

The reference computes all metrics on the host after a D2H copy per valid
step (``al_trainer.py:1516-1556``): medpy ``dc``/``asd``/``jc`` + SimpleITK
Hausdorff. Here the whole per-class metric pass is ONE jitted program built
on the EDT / surface-distance kernels in ``mia_tpu.ops.distance`` — the only
host traffic is the final scalars.

Conventions preserved:
- ``metric_percase`` (AL path, ``al_trainer.py:1539-1556``): masks are
  binarized (>0); if ``pred`` is empty → (dice 0, hd NaN, asd NaN, jc 0).
- ``cal_hd`` (``metric/metric.py:82-108``): both empty → 0, one empty → inf.
- SAM path (``validation.py:15-26``): (dice, hd95); pred empty → (0, NaN).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.distance import surface_distance_stats


def dice_coefficient(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """medpy ``dc``: 2|A∩B| / (|A|+|B|); 0 when both empty (medpy's except path)."""
    p = (pred > 0).astype(jnp.float32)
    g = (gt > 0).astype(jnp.float32)
    intersect = jnp.sum(p * g)
    denom = jnp.sum(p) + jnp.sum(g)
    return jnp.where(denom > 0, 2.0 * intersect / jnp.maximum(denom, 1.0), 0.0)


def jaccard(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """medpy ``jc``: |A∩B| / |A∪B|."""
    p = pred > 0
    g = gt > 0
    intersect = jnp.sum(p & g).astype(jnp.float32)
    union = jnp.sum(p | g).astype(jnp.float32)
    return jnp.where(union > 0, intersect / jnp.maximum(union, 1.0), 0.0)


def metric_percase(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    spacing: tuple[float, ...] | None = None,
):
    """(dice, hd, asd, jc) for one binary case — AL-trainer parity.

    ``pred``/``gt`` are label maps; anything >0 is foreground.
    """
    p = pred > 0
    g = gt > 0
    dice = dice_coefficient(p, g)
    jc = jaccard(p, g)
    stats = surface_distance_stats(p, g, spacing)

    p_any = jnp.sum(p) > 0
    g_any = jnp.sum(g) > 0
    # cal_hd conventions (metric/metric.py:86-92)
    hd = jnp.where(
        p_any & g_any,
        stats["hd"],
        jnp.where(~p_any & ~g_any, 0.0, jnp.inf),
    )
    asd = jnp.where(p_any & g_any, stats["asd"], jnp.inf)
    # pred empty → dice 0, hd/asd NaN, jc 0 (al_trainer.py:1546-1556)
    nan = jnp.float32(jnp.nan)
    dice = jnp.where(p_any, dice, 0.0)
    hd = jnp.where(p_any, hd, nan)
    asd = jnp.where(p_any, asd, nan)
    jc = jnp.where(p_any, jc, 0.0)
    return dice, hd, asd, jc


def metric_percase_hd95(pred: jnp.ndarray, gt: jnp.ndarray):
    """(dice, hd95) — SAM validation parity (``validation.py:15-26``)."""
    p = pred > 0
    g = gt > 0
    dice = dice_coefficient(p, g)
    stats = surface_distance_stats(p, g, None)
    p_any = jnp.sum(p) > 0
    g_any = jnp.sum(g) > 0
    nan = jnp.float32(jnp.nan)
    hd95 = jnp.where(p_any & g_any, stats["hd95"], jnp.where(p_any, jnp.inf, nan))
    dice = jnp.where(p_any, dice, 0.0)
    return dice, hd95


def per_class_metrics(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    num_classes: int,
    spacing: tuple[float, ...] | None = None,
):
    """Per-foreground-class (dice, hd, asd, jc), classes 1..num_classes-1.

    One jitted program for the whole per-class loop the reference runs on
    the host (``al_trainer.py:1528-1535``). Returns (C-1, 4) float32.
    """

    def one_class(c):
        return jnp.stack(metric_percase(pred == c, gt == c, spacing))

    classes = jnp.arange(1, num_classes)
    # lax.map keeps compile size O(1) in num_classes
    return jax.lax.map(one_class, classes)
