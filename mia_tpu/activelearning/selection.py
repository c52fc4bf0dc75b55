"""Device-side selection algorithms: k-center greedy and weighted k-means++.

Replaces the reference's sklearn/Cython kernels
(``coreset_selector.py:19-51`` kcenter_greedy over a host dist matrix;
``sklearn.cluster.kmeans_plusplus`` in the kmean/badge selectors) with pure
XLA programs: fixed-shape ``lax.fori_loop`` updates, MXU pairwise distances,
no host round-trips until the final index fetch. Budgets are tiny (tens), so
the loops compile once and the N×N work stays on device.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import pairwise_distances

_NEG = -1.0e30
_POS = 1.0e30


def kcenter_greedy(
    dist_mat: jnp.ndarray,
    init_mask: jnp.ndarray,
    budget: int,
    criteria: str = "min",
) -> jnp.ndarray:
    """Greedy k-center over a dense (N, N) distance matrix.

    ``init_mask`` marks already-selected points. Each step picks the
    unselected point whose min (or mean) distance to the selected set is
    largest (``coreset_selector.py:19-51``). Returns the ``budget`` newly
    selected indices in selection order.
    """
    n = dist_mat.shape[0]
    dist_mat = dist_mat.astype(jnp.float32)
    init_mask = init_mask.astype(jnp.bool_)

    def body(i, carry):
        mask, picks = carry
        sel = mask.astype(jnp.float32)
        if criteria == "min":
            d = jnp.min(jnp.where(mask[None, :], dist_mat, _POS), axis=1)
        elif criteria == "mean":
            cnt = jnp.maximum(jnp.sum(sel), 1.0)
            d = jnp.sum(dist_mat * sel[None, :], axis=1) / cnt
        else:
            raise RuntimeError(f"coreset_criteria {criteria} is undefined")
        scores = jnp.where(mask, _NEG, d)
        q = jnp.argmax(scores)
        return mask.at[q].set(True), picks.at[i].set(q)

    picks = jnp.zeros((budget,), jnp.int32)
    _, picks = lax.fori_loop(0, budget, body, (init_mask, picks))
    return picks


def kmeans_plusplus(
    rng: jax.Array,
    x: jnp.ndarray,
    n_clusters: int,
    sample_weight: jnp.ndarray | None = None,
    n_local_trials: int | None = None,
) -> jnp.ndarray:
    """sklearn ``kmeans_plusplus`` semantics on device: first center drawn
    ∝ sample_weight, then greedy local trials drawn ∝ weight·D², keeping the
    candidate that minimizes the weighted potential. Returns (k,) indices.
    """
    n = x.shape[0]
    x = x.astype(jnp.float32)
    if sample_weight is None:
        w = jnp.ones((n,), jnp.float32)
    else:
        w = sample_weight.astype(jnp.float32)
    w = w / jnp.sum(w)
    if n_local_trials is None:
        n_local_trials = 2 + int(math.log(max(n_clusters, 1)) + 1e-9)

    d2 = jnp.square(pairwise_distances(x, x, metric="l2"))  # (N, N)

    rng, first_rng = jax.random.split(rng)
    first = jax.random.choice(first_rng, n, p=w)

    closest = d2[first]  # squared distance to nearest chosen center
    indices = jnp.zeros((n_clusters,), jnp.int32).at[0].set(first)

    def body(c, carry):
        closest, indices, rng = carry
        rng, r = jax.random.split(rng)
        pot = w * closest
        total = jnp.sum(pot)
        cum = jnp.cumsum(pot)
        rand_vals = jax.random.uniform(r, (n_local_trials,)) * total
        cand = jnp.clip(jnp.searchsorted(cum, rand_vals), 0, n - 1)
        # potential if each candidate were added
        new_closest = jnp.minimum(closest[None, :], d2[cand])  # (T, N)
        new_pot = jnp.sum(w[None, :] * new_closest, axis=1)
        best = jnp.argmin(new_pot)
        chosen = cand[best]
        return (
            jnp.minimum(closest, d2[chosen]),
            indices.at[c].set(chosen),
            rng,
        )

    closest, indices, _ = lax.fori_loop(1, n_clusters, body, (closest, indices, rng))
    return indices
