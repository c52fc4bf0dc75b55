"""Golden-value tests: mia_tpu losses vs torch reference math.

The torch formulations below re-state the reference's loss semantics
(``src/losses/*.py``) so parity is checked numerically, channel-last JAX vs
channel-first torch.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from mia_tpu.losses import (
    DCAndCELoss,
    DiceAndCELoss,
    DualBranchDiceAndCELoss,
    bce_with_logits,
    cross_entropy,
    memory_efficient_soft_dice_loss,
    soft_dice_loss,
    topk_loss,
)
from mia_tpu.schedule import linear_ramp_up, poly_warmup_schedule, sigmoid_ramp_up


def _rand_case(rng, b=2, c=4, h=16, w=16):
    logits = rng.standard_normal((b, h, w, c)).astype(np.float32)
    labels = rng.integers(0, c, (b, h, w)).astype(np.int32)
    t_logits = torch.from_numpy(np.moveaxis(logits, -1, 1).copy())
    t_labels = torch.from_numpy(labels.astype(np.int64))
    return logits, labels, t_logits, t_labels


def torch_dice(outputs, targets, smooth=1e-5, do_bg=True, softmax=True, batch=False, squared=False):
    # restatement of reference DiceLoss.forward (dice_loss.py:35-76)
    if softmax:
        outputs = torch.softmax(outputs, dim=1)
    c = outputs.shape[1]
    onehot = F.one_hot(targets, c).permute(0, 3, 1, 2).float()
    if not do_bg:
        outputs, onehot = outputs[:, 1:], onehot[:, 1:]
    axes = tuple(range(2, outputs.ndim))
    if squared:
        i, sp, st = (outputs * onehot).sum(axes), (outputs**2).sum(axes), (onehot**2).sum(axes)
    else:
        i, sp, st = (outputs * onehot).sum(axes), outputs.sum(axes), onehot.sum(axes)
    if batch:
        i, sp, st = i.mean(0), sp.mean(0), st.mean(0)
    return (1 - (2 * i + smooth) / (sp + st + smooth)).mean()


@pytest.mark.parametrize("do_bg", [True, False])
@pytest.mark.parametrize("batch", [True, False])
@pytest.mark.parametrize("squared", [True, False])
def test_soft_dice_parity(rng, do_bg, batch, squared):
    logits, labels, t_logits, t_labels = _rand_case(rng)
    ours = soft_dice_loss(
        jnp.asarray(logits), jnp.asarray(labels), do_bg=do_bg, batch=batch, squared=squared
    )
    ref = torch_dice(t_logits, t_labels, do_bg=do_bg, batch=batch, squared=squared)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-6)


def test_memory_efficient_dice_parity(rng):
    logits, labels, t_logits, t_labels = _rand_case(rng)
    ours = memory_efficient_soft_dice_loss(
        jnp.asarray(logits), jnp.asarray(labels), batch_dice=True, do_bg=False, smooth=1.0
    )
    # restatement of MemoryEfficientSoftDiceLoss (dice_loss.py:100-154)
    x = torch.softmax(t_logits, 1)
    y = F.one_hot(t_labels, x.shape[1]).permute(0, 3, 1, 2).float()
    x, y = x[:, 1:], y[:, 1:]
    axes = (2, 3)
    i, sp, sg = (x * y).sum(axes).sum(0), x.sum(axes).sum(0), y.sum(axes).sum(0)
    ref = -((2 * i + 1.0) / torch.clip(sg + sp + 1.0, 1e-8)).mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-6)


def test_cross_entropy_parity(rng):
    logits, labels, t_logits, t_labels = _rand_case(rng)
    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    ref = F.cross_entropy(t_logits, t_labels)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-6)


def test_cross_entropy_weight_ignore(rng):
    logits, labels, t_logits, t_labels = _rand_case(rng)
    w = np.array([1.0, 2.0, 0.5, 1.5], np.float32)
    ours = cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), weight=jnp.asarray(w), ignore_index=2
    )
    ref = F.cross_entropy(t_logits, t_labels, weight=torch.from_numpy(w), ignore_index=2)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-6)


def test_topk_loss_parity(rng):
    logits, labels, t_logits, t_labels = _rand_case(rng)
    ours = topk_loss(jnp.asarray(logits), jnp.asarray(labels), k=10)
    per = F.cross_entropy(t_logits, t_labels, reduction="none").view(-1)
    num = int(per.numel() * 10 / 100)
    ref = torch.topk(per, num, sorted=False)[0].mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-6)


def test_bce_with_logits_parity(rng):
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    t = rng.random((2, 8, 8, 3)).astype(np.float32)
    ours = bce_with_logits(jnp.asarray(x), jnp.asarray(t))
    ref = F.binary_cross_entropy_with_logits(torch.from_numpy(x), torch.from_numpy(t))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-6)


def test_dice_and_ce_loss(rng):
    logits, labels, t_logits, t_labels = _rand_case(rng)
    loss_fn = DiceAndCELoss(dice_weight=0.7, ce_weight=0.3)
    total, ce, dice = loss_fn(jnp.asarray(logits), jnp.asarray(labels))
    ref_ce = F.cross_entropy(t_logits, t_labels)
    ref_dice = torch_dice(t_logits, t_labels, do_bg=True)
    np.testing.assert_allclose(float(ce), float(ref_ce), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(dice), float(ref_dice), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(total), 0.3 * float(ref_ce) + 0.7 * float(ref_dice), rtol=1e-5)
    # per-call weight override (compound_losses.py:34-49)
    total2, _, _ = loss_fn(jnp.asarray(logits), jnp.asarray(labels), dice_weight=1.0, ce_weight=1.0)
    np.testing.assert_allclose(float(total2), float(ref_ce) + float(ref_dice), rtol=1e-5)


def test_dual_branch_loss(rng):
    logits1, labels, t1, tl = _rand_case(rng)
    logits2 = rng.standard_normal(logits1.shape).astype(np.float32)
    outs = {"low_res_logits1": jnp.asarray(logits1), "low_res_logits2": jnp.asarray(logits2)}
    loss, l1, ce1, d1, l2, ce2, d2 = DualBranchDiceAndCELoss(dice_weight=0.8)(outs, jnp.asarray(labels))
    np.testing.assert_allclose(float(l1), 0.2 * float(ce1) + 0.8 * float(d1), rtol=1e-5)
    np.testing.assert_allclose(float(loss), float(l1) + float(l2), rtol=1e-5)


def test_dc_and_ce_ignore_label(rng):
    logits, labels, t_logits, t_labels = _rand_case(rng)
    labels = labels.copy()
    labels[0, :4] = 255  # ignore region
    ours = DCAndCELoss(ignore_label=255, batch_dice=False, do_bg=True)(
        jnp.asarray(logits), jnp.asarray(labels)
    )
    assert np.isfinite(float(ours))
    # CE part must equal torch CE with ignore_index
    ce_ref = F.cross_entropy(t_logits, torch.from_numpy(labels.astype(np.int64)), ignore_index=255)
    dice_only = DCAndCELoss(ignore_label=255, weight_ce=0.0)(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(
        float(ours) - float(dice_only), float(ce_ref), rtol=1e-5, atol=1e-6
    )


def test_poly_warmup_schedule():
    # restatement of PolyLRScheduler.step (lr_scheduler.py:31-55)
    sched = poly_warmup_schedule(0.01, max_steps=100, warmup_steps=10)
    for step in [0, 5, 9, 10, 50, 99]:
        if step < 10:
            ref = 0.01 * (step + 1) / 10
        else:
            ref = 0.01 * (1.0 - (step - 10) / 90) ** 0.9
        np.testing.assert_allclose(float(sched(step)), ref, rtol=1e-5)
    sched_i = poly_warmup_schedule(0.01, max_steps=100, warmup_steps=10, interval=5)
    # interval quantization: steps 0..4 share index 0
    assert float(sched_i(0)) == float(sched_i(4))
    np.testing.assert_allclose(float(sched_i(0)), 0.01 * 1 / 2, rtol=1e-6)


def test_schedules_host_numpy_matches_traced():
    # host calls (Python int step) must evaluate in numpy — no device
    # dispatch per train-loop iteration — and agree with the traced path
    import jax
    import jax.numpy as jnp

    for sched in (
        poly_warmup_schedule(0.01, max_steps=100, warmup_steps=10),
        sigmoid_ramp_up(2.0, max_steps=40),
        linear_ramp_up(3.0, max_steps=30),
    ):
        for step in [0, 7, 29, 99]:
            host = sched(step)
            assert isinstance(host, (float, np.floating, np.ndarray)), type(host)
            traced = jax.jit(sched)(jnp.asarray(step))
            np.testing.assert_allclose(float(host), float(traced), rtol=1e-5)


def test_ramps():
    s = sigmoid_ramp_up(2.0, max_steps=40)
    np.testing.assert_allclose(float(s(0)), 2.0 * np.exp(-5.0), rtol=1e-6)
    np.testing.assert_allclose(float(s(40)), 2.0, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 2.0, rtol=1e-6)  # clipped
    l = linear_ramp_up(3.0, max_steps=30)
    np.testing.assert_allclose(float(l(15)), 1.5, rtol=1e-6)
    assert float(sigmoid_ramp_up(2.0, max_steps=0)(7)) == 2.0
