"""Soft Dice losses (channel-last, pure functions).

Behavioral parity with the reference's two Dice lineages:

- ``soft_dice_loss`` — the AL-path ``DiceLoss`` (reference
  ``src/losses/dice_loss.py:7-76``): optional softmax, optional background
  channel, optional batch-pooled statistics (mean over batch), optional
  squared denominators, ``smooth`` added to numerator and denominator,
  returns ``1 - dice`` averaged over (batch,) classes.
- ``memory_efficient_soft_dice_loss`` — the nnU-Net lineage
  (``dice_loss.py:79-154``): loss-mask support, batch statistics summed
  (not averaged), denominator clipped at 1e-8, returns ``-dice``.

In JAX the "memory efficient" trick is moot (XLA fuses the one-hot into the
reductions), but the exact math, flag semantics, and return conventions are
preserved so golden-value tests can compare against torch.

Layout: ``logits``/``probs`` are ``(B, *spatial, C)``; integer ``targets``
are ``(B, *spatial)``. One-hot targets of the same shape as ``logits`` are
accepted as-is, matching the reference's shape-equality fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _one_hot_like(targets: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """Targets as one-hot with the channel count of ``logits`` (last axis)."""
    if targets.shape == logits.shape:
        return targets.astype(jnp.float32)
    return jax.nn.one_hot(targets.astype(jnp.int32), logits.shape[-1], dtype=jnp.float32)


def soft_dice_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    *,
    smooth: float = 1e-5,
    do_bg: bool = False,
    softmax: bool = True,
    batch: bool = False,
    squared: bool = False,
) -> jnp.ndarray:
    """AL-path Dice loss. ``1 - dice`` meaned over classes (and batch).

    Parity: reference ``DiceLoss.forward`` (``dice_loss.py:35-76``). The
    reference's constructor takes ``num_classes`` (foreground count) only to
    size its one-hot; here the channel count comes from ``logits`` directly.
    """
    probs = jax.nn.softmax(logits, axis=-1) if softmax else logits
    probs = probs.astype(jnp.float32)
    onehot = _one_hot_like(targets, logits)

    if not do_bg:
        probs = probs[..., 1:]
        onehot = onehot[..., 1:]

    spatial = tuple(range(1, probs.ndim - 1))
    intersect = jnp.sum(probs * onehot, axis=spatial)
    if squared:
        sum_p = jnp.sum(jnp.square(probs), axis=spatial)
        sum_t = jnp.sum(jnp.square(onehot), axis=spatial)
    else:
        sum_p = jnp.sum(probs, axis=spatial)
        sum_t = jnp.sum(onehot, axis=spatial)

    if batch:
        intersect = jnp.mean(intersect, axis=0)
        sum_p = jnp.mean(sum_p, axis=0)
        sum_t = jnp.mean(sum_t, axis=0)

    dice = 1.0 - (2.0 * intersect + smooth) / (sum_p + sum_t + smooth)
    return jnp.mean(dice)


def memory_efficient_soft_dice_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    loss_mask: jnp.ndarray | None = None,
    *,
    apply_nonlin: str | None = "softmax",
    batch_dice: bool = False,
    do_bg: bool = True,
    smooth: float = 1.0,
) -> jnp.ndarray:
    """nnU-Net-lineage soft Dice: returns ``-dice`` (``dice_loss.py:100-154``).

    ``loss_mask`` is ``(B, *spatial)`` or ``(B, *spatial, 1)``, 1 = valid.
    """
    if apply_nonlin == "softmax":
        x = jax.nn.softmax(x, axis=-1)
    elif apply_nonlin == "sigmoid":
        x = jax.nn.sigmoid(x)
    x = x.astype(jnp.float32)
    y_onehot = _one_hot_like(y, x)
    y_onehot = jax.lax.stop_gradient(y_onehot)

    if not do_bg:
        x = x[..., 1:]
        y_onehot = y_onehot[..., 1:]

    if loss_mask is not None:
        if loss_mask.ndim == x.ndim - 1:
            loss_mask = loss_mask[..., None]
        loss_mask = loss_mask.astype(jnp.float32)

    spatial = tuple(range(1, x.ndim - 1))
    if loss_mask is None:
        sum_gt = jnp.sum(y_onehot, axis=spatial)
        intersect = jnp.sum(x * y_onehot, axis=spatial)
        sum_pred = jnp.sum(x, axis=spatial)
    else:
        sum_gt = jnp.sum(y_onehot * loss_mask, axis=spatial)
        intersect = jnp.sum(x * y_onehot * loss_mask, axis=spatial)
        sum_pred = jnp.sum(x * loss_mask, axis=spatial)

    if batch_dice:
        intersect = jnp.sum(intersect, axis=0)
        sum_pred = jnp.sum(sum_pred, axis=0)
        sum_gt = jnp.sum(sum_gt, axis=0)

    dc = (2.0 * intersect + smooth) / jnp.clip(sum_gt + sum_pred + smooth, 1e-8)
    return -jnp.mean(dc)


def get_tp_fp_fn_tn(
    net_output: jnp.ndarray,
    gt: jnp.ndarray,
    axes: tuple[int, ...] | None = None,
    mask: jnp.ndarray | None = None,
    square: bool = False,
):
    """Soft confusion counts per (batch, class), reference ``dice_loss.py:157-219``.

    ``net_output`` is ``(B, *spatial, C)`` probabilities; ``gt`` an integer
    label map or one-hot. ``axes=None`` sums over spatial axes.
    """
    if axes is None:
        axes = tuple(range(1, net_output.ndim - 1))
    y_onehot = jax.lax.stop_gradient(_one_hot_like(gt, net_output))

    tp = net_output * y_onehot
    fp = net_output * (1.0 - y_onehot)
    fn = (1.0 - net_output) * y_onehot
    tn = (1.0 - net_output) * (1.0 - y_onehot)

    if mask is not None:
        if mask.ndim == tp.ndim - 1:
            mask = mask[..., None]
        mask = jax.lax.stop_gradient(mask.astype(tp.dtype))
        tp, fp, fn, tn = tp * mask, fp * mask, fn * mask, tn * mask

    if square:
        tp, fp, fn, tn = tp**2, fp**2, fn**2, tn**2

    if len(axes) > 0:
        tp = jnp.sum(tp, axis=axes)
        fp = jnp.sum(fp, axis=axes)
        fn = jnp.sum(fn, axis=axes)
        tn = jnp.sum(tn, axis=axes)
    return tp, fp, fn, tn
