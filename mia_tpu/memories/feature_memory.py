"""Per-class prototype feature memory (reference
``src/memories/feature_memory.py:9-53``).

Functional redesign: the bank is explicit state ``(bank, valid)`` threaded
through the jitted train step — fixed shapes
``(num_classes+1, elements_per_class, feat_dim)`` with a validity mask
instead of the reference's list of variable-length numpy arrays.

Ranking parity: the reference sorts sigmoid selector scores ASCENDING and
keeps the first ``elements_per_class`` — i.e. the LOWEST-scored features —
(``feature_memory.py:40-52``); preserved via top-k on negated scores.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class FeatureMemoryState(NamedTuple):
    bank: jnp.ndarray  # (C, E, D)
    valid: jnp.ndarray  # (C, E) bool


def init_feature_memory(
    num_classes: int, feat_dim: int, elements_per_class: int = 32
) -> FeatureMemoryState:
    """``num_classes`` EXCLUDES background (reference adds 1 internally)."""
    c = num_classes + 1
    return FeatureMemoryState(
        bank=jnp.zeros((c, elements_per_class, feat_dim), jnp.float32),
        valid=jnp.zeros((c, elements_per_class), bool),
    )


def update_feature_memory(
    state: FeatureMemoryState,
    proj_features: jnp.ndarray,
    class_labels: jnp.ndarray,
    selector_scores: jnp.ndarray,
) -> FeatureMemoryState:
    """Refresh each class's bank with the lowest-selector-scored correct
    features.

    ``proj_features`` (N, D) already projected; ``class_labels`` (N,) with -1
    for rows to ignore (incorrect predictions / padding); ``selector_scores``
    (C, N) sigmoid scores from each class's selector head.
    """
    num_classes, elements = state.bank.shape[0], state.bank.shape[1]

    def one_class(c, carry):
        bank, valid = carry
        mask_c = class_labels == c
        count = jnp.sum(mask_c)
        # lowest scores first (reference ascending sort)
        score = jnp.where(mask_c, selector_scores[c], jnp.inf)
        neg_top, idx = jax.lax.top_k(-score, elements)
        new_feats = proj_features[idx]
        new_valid = jnp.arange(elements) < jnp.minimum(count, elements)
        # classes with no correct features keep their previous bank (":36")
        keep = count > 0
        bank = bank.at[c].set(jnp.where(keep, new_feats, bank[c]))
        valid = valid.at[c].set(jnp.where(keep, new_valid, valid[c]))
        return bank, valid

    bank, valid = state.bank, state.valid
    bank, valid = jax.lax.fori_loop(
        0, num_classes, lambda c, s: one_class(c, s), (bank, valid)
    )
    return FeatureMemoryState(bank=bank, valid=valid)
