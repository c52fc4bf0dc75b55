"""Prototype contrastive loss (reference
``src/losses/contrastive_loss.py:15-165``).

Functional, fixed-shape redesign: the reference gathers variable-length
per-class feature subsets (boolean indexing + ``torch.multinomial``); here
every reduction is masked, so the whole loss is one jitted program.

Behavioral notes:
- The reference's random retain subset (multinomial without replacement at
  rate ``1 - dropout``) becomes a Bernoulli retain mask — same rate,
  distribution-level parity (SURVEY §7 RNG stance).
- torch BatchNorm1d over a gathered subset becomes masked batch statistics
  (``MaskedBatchNorm`` in the model heads).
- Selector re-weighting keeps the reference math: sigmoid weights rescaled
  to mean 1 over the (masked) set on both the feature and memory axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..memories.feature_memory import FeatureMemoryState


def prototype_contrastive_loss(
    pred_features: jnp.ndarray,
    class_labels: jnp.ndarray,
    retain_mask: jnp.ndarray,
    memory: FeatureMemoryState,
    selector_scores: jnp.ndarray,
    selector_scores_memory: jnp.ndarray,
    num_classes: int,
) -> jnp.ndarray:
    """Weighted cosine distance of predicted features to the memory bank.

    Args:
      pred_features: (N, D) prediction-head outputs (already through heads).
      class_labels: (N,) int labels per feature vector.
      retain_mask: (N,) bool — the Bernoulli retain subset.
      memory: FeatureMemoryState with bank (C, E, D), valid (C, E).
      selector_scores: (C, N) raw selector outputs for the features.
      selector_scores_memory: (C, E) raw selector outputs for the bank rows.
      num_classes: foreground classes (background added internally, like the
        reference's ``num_classes + 1``).
    """
    total_classes = num_classes + 1
    feats = pred_features / jnp.maximum(
        jnp.linalg.norm(pred_features, axis=1, keepdims=True), 1e-12
    )

    def one_class(c):
        mask_c = retain_mask & (class_labels == c)
        m_count = jnp.sum(mask_c)

        bank = memory.bank[c]
        bank_valid = memory.valid[c]
        n_count = jnp.sum(bank_valid)
        bank_n = bank / jnp.maximum(jnp.linalg.norm(bank, axis=1, keepdims=True), 1e-12)

        sims = feats @ bank_n.T  # (N, E)
        dists = 1.0 - sims

        # feature-axis selector weights, rescaled to mean 1 over the set
        w_f = jax.nn.sigmoid(selector_scores[c])
        sum_w_f = jnp.sum(jnp.where(mask_c, w_f, 0.0))
        w_f = jnp.where(mask_c, m_count / jnp.maximum(sum_w_f, 1e-12) * w_f, 0.0)

        # memory-axis selector weights
        w_m = jax.nn.sigmoid(selector_scores_memory[c])
        sum_w_m = jnp.sum(jnp.where(bank_valid, w_m, 0.0))
        w_m = jnp.where(bank_valid, n_count / jnp.maximum(sum_w_m, 1e-12) * w_m, 0.0)

        weighted = dists * w_f[:, None] * w_m[None, :]
        pair_mask = mask_c[:, None] & bank_valid[None, :]
        mean = jnp.sum(jnp.where(pair_mask, weighted, 0.0)) / jnp.maximum(
            jnp.sum(pair_mask), 1.0
        )
        # reference skips classes with <2 features or <2 memory rows
        use = (m_count > 1) & (n_count > 1)
        return jnp.where(use, mean, 0.0)

    losses = jnp.stack([one_class(c) for c in range(total_classes)])
    return jnp.sum(losses) / total_classes
