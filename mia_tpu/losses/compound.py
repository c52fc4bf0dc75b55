"""Compound losses: Dice + CE combinations (channel-last).

Parity targets in ``src/losses/compound_losses.py``:
- ``DiceAndCELoss`` (:17-65) — the AL-path supervised loss. The reference
  returns only the scalar; CPC-SAM *calls it* expecting three return values
  (``cpcsam_trainer.py:1116``), a latent inconsistency SURVEY.md flags. Here
  ``__call__`` returns ``(total, ce, dice)`` — the intended API — and
  ``total(...)`` returns just the scalar.
- ``DualBranchDiceAndCELoss`` (:68-107) — 7-value return, dual logits.
- ``DC_and_CE_loss`` / ``DC_and_BCE_loss`` / ``DC_and_topk_loss``
  (:110-301) — nnU-Net lineage with ignore-label masking.

These are frozen-config callables (plain Python objects closed over static
hyperparameters), safe to use inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from .ce import bce_with_logits, cross_entropy, robust_cross_entropy, topk_loss
from .dice import memory_efficient_soft_dice_loss, soft_dice_loss


@dataclasses.dataclass(frozen=True)
class DiceAndCELoss:
    """AL supervised loss: ``ce_weight*CE + dice_weight*Dice``.

    Default dice flags mirror ``al_trainer.py:784-798``: smooth 1e-5,
    ``do_bg=True``, no batch pooling, unsquared.
    """

    dice_weight: float = 1.0
    ce_weight: float = 1.0
    smooth: float = 1e-5
    do_bg: bool = True
    softmax: bool = True
    batch: bool = False
    squared: bool = False
    ce_kwargs: tuple = ()

    def dice(self, logits, targets):
        return soft_dice_loss(
            logits,
            targets,
            smooth=self.smooth,
            do_bg=self.do_bg,
            softmax=self.softmax,
            batch=self.batch,
            squared=self.squared,
        )

    def ce(self, logits, targets):
        return cross_entropy(logits, targets, **dict(self.ce_kwargs))

    def __call__(
        self,
        logits: jnp.ndarray,
        targets: jnp.ndarray,
        dice_weight: float | None = None,
        ce_weight: float | None = None,
    ):
        dw = dice_weight if dice_weight else self.dice_weight
        cw = ce_weight if ce_weight else self.ce_weight
        loss_ce = self.ce(logits, targets)
        loss_dice = self.dice(logits, targets)
        return cw * loss_ce + dw * loss_dice, loss_ce, loss_dice

    def total(self, logits, targets, dice_weight=None, ce_weight=None):
        return self(logits, targets, dice_weight, ce_weight)[0]


@dataclasses.dataclass(frozen=True)
class DualBranchDiceAndCELoss:
    """Two-branch SAM loss (``compound_losses.py:68-107``).

    ``outputs`` is a dict with ``low_res_logits1``/``low_res_logits2``;
    returns the reference's 7-tuple
    ``(loss, loss1, ce1, dice1, loss2, ce2, dice2)`` with
    ``loss_i = (1-w)*ce_i + w*dice_i``.
    """

    dice_weight: float = 0.5
    smooth: float = 1e-5
    do_bg: bool = True
    batch: bool = False
    squared: bool = False

    def _branch(self, logits, targets, w):
        ce = cross_entropy(logits, targets)
        dice = soft_dice_loss(
            logits,
            targets,
            smooth=self.smooth,
            do_bg=self.do_bg,
            softmax=True,
            batch=self.batch,
            squared=self.squared,
        )
        return (1.0 - w) * ce + w * dice, ce, dice

    def __call__(self, outputs: dict, targets, dice_weight: float | None = None):
        w = dice_weight if dice_weight else self.dice_weight
        loss1, ce1, dice1 = self._branch(outputs["low_res_logits1"], targets, w)
        loss2, ce2, dice2 = self._branch(outputs["low_res_logits2"], targets, w)
        return loss1 + loss2, loss1, ce1, dice1, loss2, ce2, dice2


@dataclasses.dataclass(frozen=True)
class DCAndCELoss:
    """nnU-Net ``DC_and_CE_loss`` (``compound_losses.py:110-180``).

    ``target`` is an integer label map ``(B, *spatial)``; with
    ``ignore_label`` set, masked soft-dice + CE-with-ignore-index.
    """

    weight_ce: float = 1.0
    weight_dice: float = 1.0
    ignore_label: int | None = None
    batch_dice: bool = False
    do_bg: bool = True
    smooth: float = 1.0
    ce_kwargs: tuple = ()

    def __call__(self, net_output: jnp.ndarray, target: jnp.ndarray):
        ce_kwargs: dict[str, Any] = dict(self.ce_kwargs)
        if self.ignore_label is not None:
            mask = (target != self.ignore_label).astype(jnp.float32)
            target_dice = jnp.where(target == self.ignore_label, 0, target)
            ce_kwargs["ignore_index"] = self.ignore_label
        else:
            mask = None
            target_dice = target

        dc_loss = (
            memory_efficient_soft_dice_loss(
                net_output,
                target_dice,
                loss_mask=mask,
                apply_nonlin="softmax",
                batch_dice=self.batch_dice,
                do_bg=self.do_bg,
                smooth=self.smooth,
            )
            if self.weight_dice != 0
            else 0.0
        )
        ce_loss = (
            robust_cross_entropy(net_output, target, **ce_kwargs)
            if self.weight_ce != 0
            else 0.0
        )
        return self.weight_ce * ce_loss + self.weight_dice * dc_loss


@dataclasses.dataclass(frozen=True)
class DCAndBCELoss:
    """nnU-Net ``DC_and_BCE_loss`` (``compound_losses.py:183-243``): sigmoid
    region-based loss; one-hot ``target`` with optional ignore channel last."""

    weight_ce: float = 1.0
    weight_dice: float = 1.0
    use_ignore_label: bool = False
    batch_dice: bool = False
    smooth: float = 1.0

    def __call__(self, net_output: jnp.ndarray, target: jnp.ndarray):
        if self.use_ignore_label:
            mask = (1.0 - target[..., -1:].astype(jnp.float32))
            target_regions = target[..., :-1]
        else:
            mask = None
            target_regions = target

        dc_loss = memory_efficient_soft_dice_loss(
            net_output,
            target_regions,
            loss_mask=mask,
            apply_nonlin="sigmoid",
            batch_dice=self.batch_dice,
            do_bg=True,
            smooth=self.smooth,
        )
        target_regions = target_regions.astype(jnp.float32)
        if mask is not None:
            per = bce_with_logits(net_output, target_regions, reduction="none")
            ce_loss = jnp.sum(per * mask) / jnp.clip(jnp.sum(mask), 1e-8)
        else:
            ce_loss = bce_with_logits(net_output, target_regions)
        return self.weight_ce * ce_loss + self.weight_dice * dc_loss


@dataclasses.dataclass(frozen=True)
class DCAndTopKLoss:
    """nnU-Net ``DC_and_topk_loss`` (``compound_losses.py:246-301``)."""

    weight_ce: float = 1.0
    weight_dice: float = 1.0
    ignore_label: int | None = None
    batch_dice: bool = False
    do_bg: bool = True
    smooth: float = 1.0
    k: float = 10.0

    def __call__(self, net_output: jnp.ndarray, target: jnp.ndarray):
        if self.ignore_label is not None:
            mask = (target != self.ignore_label).astype(jnp.float32)
            target_dice = jnp.where(target == self.ignore_label, 0, target)
            ignore_index = self.ignore_label
        else:
            mask = None
            target_dice = target
            ignore_index = None

        dc_loss = (
            memory_efficient_soft_dice_loss(
                net_output,
                target_dice,
                loss_mask=mask,
                apply_nonlin="softmax",
                batch_dice=self.batch_dice,
                do_bg=self.do_bg,
                smooth=self.smooth,
            )
            if self.weight_dice != 0
            else 0.0
        )
        ce_loss = (
            topk_loss(net_output, target, k=self.k, ignore_index=ignore_index)
            if self.weight_ce != 0
            else 0.0
        )
        return self.weight_ce * ce_loss + self.weight_dice * dc_loss
