"""Active-learning selectors (``src/activelearning/*.py``).

API: ``select_next_batch(active_dataset, select_num, scorer, seed) ->
list[case_name]``. ``scorer`` is a ``ModelScorer`` (jitted endpoints) or
``None`` where the reference passes no model. All selectors fall back to
uniform-random scores when the labeled set is empty, like the reference.

TPU-native differences: pool sweeps run through one fixed-shape jitted
program per acquisition; k-center greedy / k-means++ run on device
(``selection.py``); randomness is an explicit numpy seed instead of torch
global state.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ..data.active import ActiveDataset
from ..ops import pairwise_distances
from .scorers import ModelScorer, sweep_pool
from .selection import kcenter_greedy, kmeans_plusplus


class ActiveSelector:
    def select_next_batch(
        self,
        active_dataset: ActiveDataset,
        select_num: int,
        scorer: ModelScorer | None,
        seed: int | None = None,
    ) -> list:
        raise NotImplementedError

    @staticmethod
    def _random_pick(active_dataset, select_num, seed):
        """Uniform-random top-k over the pool (cold-start fallback,
        ``entropy_selector.py:63-71``)."""
        pool = active_dataset.pool_dataset.image_idx
        rng = np.random.default_rng(seed)
        scores = rng.random(len(pool))
        order = np.argsort(-scores)
        return [pool[i] for i in order[:select_num]]


class RandomSelector(ActiveSelector):
    def __init__(self, **_):
        pass  # accepts (and ignores) the common selector kwargs

    def select_next_batch(self, active_dataset, select_num, scorer=None, seed=None):
        return self._random_pick(active_dataset, select_num, seed)


class _UncertaintySelector(ActiveSelector):
    KIND = ""

    def __init__(self, batch_size: int = 8, smooth: float = 1e-8, **_):
        self.batch_size = batch_size
        self.smooth = smooth

    def select_next_batch(self, active_dataset, select_num, scorer, seed=None):
        labeled_size, _ = active_dataset.get_size()
        if labeled_size == 0:
            return self._random_pick(active_dataset, select_num, seed)
        scores, case_names = sweep_pool(
            active_dataset.get_pool_dataset(),
            self.batch_size,
            lambda images: scorer.uncertainty(images, self.KIND),
            sharding=scorer.data_sharding,
        )
        order = np.argsort(-scores, kind="stable")
        return [case_names[i] for i in order[:select_num]]


class EntropySelector(_UncertaintySelector):
    KIND = "entropy"


class ConfidenceSelector(_UncertaintySelector):
    KIND = "confidence"


class MarginSelector(_UncertaintySelector):
    KIND = "margin"


def _load_features(case_names, feature_path=None, feature_dict=None):
    """Per-case foundation features from h5 files or an in-memory dict
    (``coreset_selector.py:107-118``, ``kmean_selector.py:85-88``)."""
    if feature_path is not None:
        import h5py

        feats = []
        for case in case_names:
            with h5py.File(Path(feature_path) / f"{case}.h5", "r") as h5f:
                feats.append(np.asarray(h5f["feature"]))
        return np.stack(feats, axis=0).astype(np.float32)
    if feature_dict is not None:
        return np.stack([np.asarray(feature_dict[c]) for c in case_names]).astype(
            np.float32
        )
    return None


class CoresetSelector(ActiveSelector):
    """k-center greedy over model bottleneck features ± loaded foundation
    features, fused by normalized-distance blend ("add") or scaled concat
    ("cat") (``coreset_selector.py:77-232``)."""

    def __init__(
        self,
        batch_size: int = 8,
        metric: str = "cosine",
        coreset_criteria: str = "min",
        coreset_fusion: str = "add",
        feature_path=None,
        loaded_feature_weight: float = 0.0,
        **_,
    ):
        self.batch_size = batch_size
        self.metric = metric
        self.coreset_criteria = coreset_criteria
        self.coreset_fusion = coreset_fusion
        self.feature_path = feature_path
        self.loaded_feature_weight = loaded_feature_weight

    def _features_and_dist(self, active_dataset, scorer):
        labeled = active_dataset.get_train_dataset()
        pool = active_dataset.get_pool_dataset()
        core_list = list(labeled.image_idx)
        all_list = core_list + list(pool.image_idx)

        feats = None
        if scorer is not None:
            feats_l, _ = sweep_pool(
                labeled, self.batch_size, scorer.enc_feature,
                sharding=scorer.data_sharding,
            )
            feats_p, _ = sweep_pool(
                pool, self.batch_size, scorer.enc_feature,
                sharding=scorer.data_sharding,
            )
            feats = np.concatenate([feats_l, feats_p], axis=0)

        loaded = _load_features(all_list, self.feature_path)

        if self.coreset_fusion == "add":
            final = 0.0
            if loaded is not None:
                d = np.asarray(pairwise_distances(jnp.asarray(loaded), metric=self.metric))
                final = final + self.loaded_feature_weight * (d / d.sum())
            if feats is not None:
                d = np.asarray(pairwise_distances(jnp.asarray(feats), metric=self.metric))
                final = final + (1 - self.loaded_feature_weight) * (d / d.sum())
        else:
            parts = []
            if feats is not None:
                parts.append(feats)
            if loaded is not None:
                if feats is None:
                    scale = 1.0
                else:
                    scale = np.sqrt(
                        feats.shape[-1] / loaded.shape[-1] * self.loaded_feature_weight
                    )
                parts.append(loaded * scale)
            final_feats = np.concatenate(parts, axis=1)
            final = np.asarray(
                pairwise_distances(jnp.asarray(final_feats), metric=self.metric)
            )
        return np.array(core_list), np.array(all_list), loaded, final

    def select_next_batch(self, active_dataset, select_num, scorer, seed=None):
        labeled_size, pool_size = active_dataset.get_size()
        if labeled_size == 0 and self.loaded_feature_weight == 0:
            return self._random_pick(active_dataset, select_num, seed)
        if labeled_size == 0:
            if self.feature_path:
                # cold start: k-means++ on the loaded foundation features
                # (coreset_selector.py:201-209)
                _, all_list, loaded, _ = self._features_and_dist(active_dataset, None)
                idx = kmeans_plusplus(
                    jax.random.PRNGKey(seed or 0), jnp.asarray(loaded), select_num
                )
                return list(all_list[np.asarray(idx)])
            return self._random_pick(active_dataset, select_num, seed)

        core_list, all_list, _, dist = self._features_and_dist(active_dataset, scorer)
        init_mask = jnp.arange(len(all_list)) < len(core_list)
        picks = kcenter_greedy(
            jnp.asarray(dist), init_mask, select_num, self.coreset_criteria
        )
        return list(all_list[np.asarray(picks)])


class KMeanSelector(ActiveSelector):
    """Weighted k-means++ over z-scored model ⊕ loaded features; pool→labeled
    distance as sharpened sample weight (``kmean_selector.py:90-196``)."""

    def __init__(
        self,
        batch_size: int = 8,
        metric: str = "cosine",
        feature_path=None,
        feature_dict: dict | None = None,
        coreset_criteria: str = "min",
        loaded_feature_weight: float = 1.0,
        loaded_feature_only: bool = False,
        sharp_factor: float = 1.0,
        softmax: bool = False,
        **_,
    ):
        self.batch_size = batch_size
        self.metric = metric
        self.feature_path = feature_path
        self.feature_dict = feature_dict
        self.coreset_criteria = coreset_criteria
        self.loaded_feature_weight = loaded_feature_weight
        self.loaded_feature_only = loaded_feature_only
        self.sharp_factor = sharp_factor
        self.softmax = softmax

    def _get_features(self, dataset, scorer):
        case_names = dataset.case_names()
        parts = []
        feats = None
        if scorer is not None and not self.loaded_feature_only:
            feats, case_names = sweep_pool(
                dataset, self.batch_size, scorer.enc_feature,
                sharding=scorer.data_sharding,
            )
            # per-sample z-score across feature dim (kmean_selector.py:100-104)
            feats = (feats - feats.mean(1, keepdims=True)) / feats.std(1, keepdims=True)
            parts.append(feats)
        loaded = _load_features(case_names, self.feature_path, self.feature_dict)
        if loaded is not None:
            loaded = (loaded - loaded.mean(1, keepdims=True)) / loaded.std(
                1, keepdims=True
            )
            if feats is None:
                scale = 1.0
            else:
                scale = np.sqrt(
                    feats.shape[-1] / loaded.shape[-1] * self.loaded_feature_weight
                )
            parts.append(loaded * scale)
        return np.concatenate(parts, axis=1), np.array(case_names)

    def select_next_batch(self, active_dataset, select_num, scorer, seed=None):
        labeled_size, _ = active_dataset.get_size()
        pool_feats, pool_case_names = self._get_features(
            active_dataset.get_pool_dataset(), scorer
        )

        sample_weight = None
        if labeled_size > 0:
            labeled_feats, _ = self._get_features(
                active_dataset.get_train_dataset(), scorer
            )
            d = np.asarray(
                pairwise_distances(
                    jnp.asarray(pool_feats), jnp.asarray(labeled_feats), self.metric
                )
            )
            w = d.min(axis=1) if self.coreset_criteria == "min" else d.mean(axis=1)
            if self.softmax:
                e = np.exp(w * self.sharp_factor - (w * self.sharp_factor).max())
                sample_weight = e / e.sum()
            else:
                w = w**self.sharp_factor
                sample_weight = w / w.sum()

        idx = kmeans_plusplus(
            jax.random.PRNGKey(seed or 0),
            jnp.asarray(pool_feats),
            select_num,
            None if sample_weight is None else jnp.asarray(sample_weight),
        )
        # reference dedups via set() (kmean_selector.py:196); k-means++ can
        # in principle repeat an index — preserve uniqueness, keep order
        out, seen = [], set()
        for i in np.asarray(idx):
            name = pool_case_names[int(i)]
            if name not in seen:
                seen.add(name)
                out.append(name)
        return out


class BADGESelector(ActiveSelector):
    """k-means++ over per-image seg-head gradient embeddings
    (``badge_selector.py:37-128``)."""

    def __init__(self, batch_size: int = 1, multiple_loss: str = "add", **_):
        self.batch_size = batch_size
        self.multiple_loss = multiple_loss

    def select_next_batch(self, active_dataset, select_num, scorer, seed=None):
        labeled_size, _ = active_dataset.get_size()
        if labeled_size == 0:
            return self._random_pick(active_dataset, select_num, seed)
        embeds, case_names = sweep_pool(
            active_dataset.get_pool_dataset(),
            self.batch_size,
            scorer.badge_grad_embedding,
            sharding=scorer.data_sharding,
        )
        idx = kmeans_plusplus(
            jax.random.PRNGKey(seed or 0), jnp.asarray(embeds), select_num
        )
        return [case_names[int(i)] for i in np.asarray(idx)]


SELECTORS = {
    "random": RandomSelector,
    "entropy": EntropySelector,
    "confidence": ConfidenceSelector,
    "margin": MarginSelector,
    "coreset-l2": lambda **kw: CoresetSelector(metric="l2", **kw),
    "coreset-cosine": lambda **kw: CoresetSelector(metric="cosine", **kw),
    "kmean-l2": lambda **kw: KMeanSelector(metric="l2", **kw),
    "kmean-cosine": lambda **kw: KMeanSelector(metric="cosine", **kw),
    "badge": BADGESelector,
}
