"""Metrics golden tests vs scipy-based re-implementations of medpy/SimpleITK.

medpy/SimpleITK are not installed; their math is restated with
scipy.ndimage (the same backend medpy uses) so the conventions of
``al_trainer.py:1539-1556`` and ``metric/metric.py:82-108`` are checked.
"""

import numpy as np
from scipy import ndimage

import jax.numpy as jnp

from mia_tpu.metrics import (
    dice_coefficient,
    jaccard,
    metric_percase,
    metric_percase_hd95,
    per_class_metrics,
)


def _border(mask):
    # medpy __surface_distances border: mask ^ binary_erosion(mask, cross, border_value=0)
    footprint = ndimage.generate_binary_structure(mask.ndim, 1)
    eroded = ndimage.binary_erosion(mask, footprint, border_value=0)
    return mask & ~eroded


def _directed_distances(a, b, spacing=None):
    bb = _border(b)
    dt = ndimage.distance_transform_edt(~bb, sampling=spacing)
    return dt[_border(a)]


def golden_metrics(pred, gt, spacing=None):
    pred = pred.astype(bool)
    gt = gt.astype(bool)
    inter = (pred & gt).sum()
    dice = 2 * inter / (pred.sum() + gt.sum())
    jc = inter / (pred | gt).sum()
    d_pg = _directed_distances(pred, gt, spacing)
    d_gp = _directed_distances(gt, pred, spacing)
    hd = max(d_pg.max(), d_gp.max())
    hd95 = np.percentile(np.hstack([d_pg, d_gp]), 95)
    asd = d_pg.mean()
    return dice, hd, hd95, asd, jc


def _blob(rng, shape=(48, 48), seed_frac=0.05):
    m = rng.random(shape) < seed_frac
    m = ndimage.binary_dilation(m, iterations=3)
    return m.astype(np.int32)


def test_metric_percase_vs_golden(rng):
    pred = _blob(rng)
    gt = _blob(rng)
    dice, hd, asd, jc = metric_percase(jnp.asarray(pred), jnp.asarray(gt))
    g_dice, g_hd, _, g_asd, g_jc = golden_metrics(pred, gt)
    np.testing.assert_allclose(float(dice), g_dice, rtol=1e-5)
    np.testing.assert_allclose(float(jc), g_jc, rtol=1e-5)
    np.testing.assert_allclose(float(hd), g_hd, rtol=1e-4)
    np.testing.assert_allclose(float(asd), g_asd, rtol=1e-4)


def test_metric_percase_spacing(rng):
    pred = _blob(rng, (32, 32))
    gt = _blob(rng, (32, 32))
    sp = (2.0, 0.5)
    dice, hd, asd, jc = metric_percase(jnp.asarray(pred), jnp.asarray(gt), spacing=sp)
    _, g_hd, _, g_asd, _ = golden_metrics(pred, gt, spacing=sp)
    np.testing.assert_allclose(float(hd), g_hd, rtol=1e-4)
    np.testing.assert_allclose(float(asd), g_asd, rtol=1e-4)


def test_hd95_vs_golden(rng):
    pred = _blob(rng)
    gt = _blob(rng)
    dice, hd95 = metric_percase_hd95(jnp.asarray(pred), jnp.asarray(gt))
    g_dice, _, g_hd95, _, _ = golden_metrics(pred, gt)
    np.testing.assert_allclose(float(dice), g_dice, rtol=1e-5)
    np.testing.assert_allclose(float(hd95), g_hd95, rtol=1e-3)


def test_empty_mask_conventions():
    empty = jnp.zeros((16, 16), jnp.int32)
    full = jnp.zeros((16, 16), jnp.int32).at[4:8, 4:8].set(1)
    # pred empty → dice 0, hd nan, asd nan, jc 0 (al_trainer.py:1546-1556)
    dice, hd, asd, jc = metric_percase(empty, full)
    assert float(dice) == 0.0 and float(jc) == 0.0
    assert np.isnan(float(hd)) and np.isnan(float(asd))
    # both empty → hd 0 via cal_hd, but pred empty takes precedence → NaN
    dice, hd, asd, jc = metric_percase(empty, empty)
    assert np.isnan(float(hd))
    # pred nonempty, gt empty → hd inf (cal_hd one-empty convention)
    dice, hd, asd, jc = metric_percase(full, empty)
    assert np.isinf(float(hd)) and float(dice) == 0.0


def test_per_class_metrics(rng):
    pred = rng.integers(0, 4, (32, 32)).astype(np.int32)
    gt = rng.integers(0, 4, (32, 32)).astype(np.int32)
    out = np.asarray(per_class_metrics(jnp.asarray(pred), jnp.asarray(gt), 4))
    assert out.shape == (3, 4)
    for i, c in enumerate([1, 2, 3]):
        d, h, a, j = metric_percase(jnp.asarray(pred == c), jnp.asarray(gt == c))
        np.testing.assert_allclose(out[i, 0], float(d), rtol=1e-5)
        np.testing.assert_allclose(out[i, 3], float(j), rtol=1e-5)


def test_hd_module_fugc_classes(rng):
    from mia_tpu.metrics import HD, cal_hd

    label = np.zeros((24, 24), np.int64)
    label[4:10, 4:10] = 1
    label[14:20, 14:20] = 2
    logits = np.zeros((1, 24, 24, 3), np.float32)
    logits[..., 0] = 1.0
    logits[0, 4:10, 4:10] = [0, 5, 0]
    logits[0, 14:20, 14:20] = [0, 0, 5]
    # perfect prediction → all three HDs are 0
    assert HD()(logits, label[None]) == 0.0
    # one-empty convention
    assert np.isinf(cal_hd(np.ones((8, 8)), np.zeros((8, 8))))
    assert cal_hd(np.zeros((8, 8)), np.zeros((8, 8))) == 0.0
