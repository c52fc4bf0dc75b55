"""Cross-entropy family (channel-last, pure functions).

Parity targets: torch ``nn.CrossEntropyLoss`` as used on the AL path
(plain, mean reduction — reference ``al_trainer.py:794``), the nnU-Net
``RobustCrossEntropyLoss``/``TopKLoss`` (``src/losses/ce_loss.py``), and
``nn.BCEWithLogitsLoss`` for the region-based path.

Layout: ``logits`` are ``(B, *spatial, C)``; ``targets`` ``(B, *spatial)``
int. Class weights and ``ignore_index`` follow torch semantics: the mean is
weighted by per-pixel class weight, ignored pixels contribute zero weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    *,
    weight: jnp.ndarray | None = None,
    ignore_index: int | None = None,
    label_smoothing: float = 0.0,
    reduction: str = "mean",
) -> jnp.ndarray:
    """torch ``F.cross_entropy`` over the last axis of ``logits``.

    TPU note: deliberately gather-free. A minor-dim ``take_along_axis``
    over (B, H, W, C) logits is unvectorizable on TPU and measured 65%
    slower per UNet train step; the one-hot compare + sum below computes
    the identical value on the VPU.
    """
    num_classes = logits.shape[-1]
    targets = targets.astype(jnp.int32)
    safe_targets = jnp.clip(targets, 0, num_classes - 1)
    lf = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lf, axis=-1)
    onehot = (safe_targets[..., None] == jnp.arange(num_classes)).astype(jnp.float32)
    picked = jnp.sum(lf * onehot, axis=-1)
    nll = lse - picked
    if label_smoothing > 0.0:
        # -mean(logp) = lse - mean(logits)
        smooth = lse - jnp.mean(lf, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth

    pix_w = jnp.ones_like(nll)
    if weight is not None:
        pix_w = onehot @ jnp.asarray(weight, jnp.float32)
    if ignore_index is not None:
        valid = (targets != ignore_index).astype(jnp.float32)
        pix_w = pix_w * valid
    nll = nll * pix_w

    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if weight is not None or ignore_index is not None:
        return jnp.sum(nll) / jnp.clip(jnp.sum(pix_w), 1e-8)
    return jnp.mean(nll)


def robust_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    **kwargs,
) -> jnp.ndarray:
    """``RobustCrossEntropyLoss`` (``ce_loss.py:6-16``): tolerates a trailing
    singleton channel on float targets."""
    if targets.ndim == logits.ndim:
        assert targets.shape[-1] == 1
        targets = targets[..., 0]
    return cross_entropy(logits, targets, **kwargs)


def topk_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    *,
    k: float = 10.0,
    ignore_index: int | None = None,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """``TopKLoss`` (``ce_loss.py:19-32``): mean of the top k% per-pixel CE.

    The top-k size is static (shapes are static under jit), so this lowers
    to a single ``lax.top_k`` — no host sync.
    """
    if targets.ndim == logits.ndim:
        targets = targets[..., 0]
    per_pixel = cross_entropy(
        logits,
        targets,
        ignore_index=ignore_index,
        label_smoothing=label_smoothing,
        reduction="none",
    )
    flat = per_pixel.reshape(-1)
    num = max(1, int(flat.shape[0] * k / 100))
    top, _ = jax.lax.top_k(flat, num)
    return jnp.mean(top)


def bce_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    *,
    reduction: str = "mean",
) -> jnp.ndarray:
    """torch ``BCEWithLogitsLoss``: numerically stable sigmoid BCE."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    return jnp.mean(loss)
