"""AL engine tests: device selection kernels vs host goldens + end-to-end
selector runs on a synthetic FUGC pool with a tiny UNet."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mia_tpu.activelearning import (
    SELECTORS,
    ModelScorer,
    kcenter_greedy,
    kmeans_plusplus,
)
from mia_tpu.data import ActiveDataset, ExtendableDataset, FUGCDataset
from mia_tpu.models.unet import UNet, UNetConfig
from mia_tpu.schedule import poly_warmup_schedule
from mia_tpu.training import create_train_state, make_optimizer

from synth_data import make_fugc


def ref_kcenter_greedy(dist_mat, budget, init_idx, criteria="min"):
    # restatement of coreset_selector.py:19-51
    n = dist_mat.shape[0]
    labeled = np.zeros(n, bool)
    labeled[init_idx] = True
    picks = []
    for _ in range(budget):
        mat = dist_mat[~labeled][:, labeled]
        mat_min = mat.min(axis=1) if criteria == "min" else mat.mean(axis=1)
        q = np.arange(n)[~labeled][mat_min.argmax()]
        labeled[q] = True
        picks.append(q)
    return picks


@pytest.mark.parametrize("criteria", ["min", "mean"])
def test_kcenter_greedy_matches_reference(rng, criteria):
    x = rng.random((20, 5)).astype(np.float32)
    d = np.sqrt(((x[:, None] - x[None]) ** 2).sum(-1))
    init = [0, 1, 2]
    ref = ref_kcenter_greedy(d, 5, init, criteria)
    init_mask = jnp.zeros(20, bool).at[jnp.asarray(init)].set(True)
    ours = kcenter_greedy(jnp.asarray(d), init_mask, 5, criteria)
    assert list(np.asarray(ours)) == ref


def test_kmeans_plusplus_spreads(rng):
    # two well-separated blobs: picks must hit both
    a = rng.normal(0, 0.1, (20, 2))
    b = rng.normal(5, 0.1, (20, 2))
    x = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    idx = np.asarray(kmeans_plusplus(jax.random.PRNGKey(0), x, 2))
    assert len(set(idx)) == 2
    assert (idx < 20).sum() == 1 and (idx >= 20).sum() == 1


def test_kmeans_plusplus_sample_weight(rng):
    x = jnp.asarray(rng.random((30, 3)).astype(np.float32))
    w = np.zeros(30, np.float32)
    w[5] = 1.0  # all weight on one point → first center must be 5
    idx = np.asarray(kmeans_plusplus(jax.random.PRNGKey(1), x, 1, jnp.asarray(w)))
    assert idx[0] == 5


def _tiny_scorer():
    cfg = UNetConfig(in_channels=3, out_classes=3, channels_list=(4, 8), dropout_prob=None)
    model = UNet(cfg)
    tx = make_optimizer("adam", poly_warmup_schedule(1e-3, 10, 0))
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), tx
    )
    return ModelScorer(model, state)


@pytest.fixture(scope="module")
def fugc_active(tmp_path_factory):
    root = tmp_path_factory.mktemp("fugc")
    make_fugc(root, n_train=8, size=(32, 32))
    base = FUGCDataset(root, split="train", image_size=32)
    names = base.case_names()
    return lambda n_labeled: ActiveDataset(
        ExtendableDataset(base, list(names[:n_labeled])),
        ExtendableDataset(base, list(names[n_labeled:])),
    )


@pytest.mark.parametrize(
    "name", ["random", "entropy", "confidence", "margin", "coreset-l2", "kmean-l2", "badge"]
)
def test_selectors_end_to_end(fugc_active, name):
    active = fugc_active(3)
    scorer = _tiny_scorer()
    selector = SELECTORS[name](batch_size=4) if name != "random" else SELECTORS[name]()
    picked = selector.select_next_batch(active, 2, scorer, seed=0)
    pool = set(active.pool_dataset.image_idx)
    assert len(picked) == 2 and len(set(picked)) == 2
    assert set(picked) <= pool
    # and the AL state machine accepts them
    active.extend_train_set(picked)
    assert active.get_size() == (5, 3)


@pytest.mark.parametrize("name", ["entropy", "coreset-l2", "badge"])
def test_selectors_cold_start_random(fugc_active, name):
    active = fugc_active(0)
    selector = SELECTORS[name](batch_size=4)
    picked = selector.select_next_batch(active, 3, None, seed=0)
    assert len(picked) == 3


def test_badge_embedding_batch_invariant(fugc_active):
    """The vmap(grad) BADGE embedding is per-image, so sweeping the pool at
    batch 8 must equal the reference-style batch-1 sweep (the forced
    ``batch_size=1`` torch memory workaround is obsolete here)."""
    from mia_tpu.activelearning.scorers import sweep_pool

    active = fugc_active(3)
    scorer = _tiny_scorer()
    pool = active.pool_dataset
    emb1, names1 = sweep_pool(pool, 1, scorer.badge_grad_embedding)
    emb8, names8 = sweep_pool(pool, 8, scorer.badge_grad_embedding)
    assert names1 == names8
    np.testing.assert_allclose(emb8, emb1, rtol=1e-5, atol=1e-6)


def test_uncertainty_scores_match_formulas(rng):
    from mia_tpu.activelearning import confidence_score, entropy_score, margin_score

    probs = jax.nn.softmax(jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32)))
    p = np.asarray(probs)
    ent = np.mean(np.mean(-p * np.log2(p + 1e-8), axis=-1), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(entropy_score(probs)), ent, rtol=1e-5)
    conf = np.mean(-p.max(-1), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(confidence_score(probs)), conf, rtol=1e-5)
    s = np.sort(p, axis=-1)
    marg = np.mean(-(s[..., -1] - s[..., -2]), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(margin_score(probs)), marg, rtol=1e-5)


def test_scorer_normalize_matches_host_zscore(rng):
    # normalize=True on raw images == normalize=False on host-z-scored
    # images (reference: pool dataset carries ZScoreNormalize when
    # do_normalize, al_trainer.py:623/721-734)
    from mia_tpu.data.base import host_zscore

    cfg = UNetConfig(
        in_channels=3, out_classes=3, channels_list=(4, 8), dropout_prob=None
    )
    model = UNet(cfg)
    tx = make_optimizer("adam", poly_warmup_schedule(1e-3, 10, 0))
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), tx
    )
    raw = jnp.asarray(rng.random((3, 32, 32, 3)), jnp.float32)
    normed = jnp.stack([jnp.asarray(host_zscore(np.asarray(im))) for im in raw])

    s_dev = ModelScorer(model, state, normalize=True)
    s_host = ModelScorer(model, state, normalize=False)
    for kind in ("entropy", "confidence", "margin"):
        np.testing.assert_allclose(
            np.asarray(s_dev.uncertainty(raw, kind)),
            np.asarray(s_host.uncertainty(normed, kind)),
            rtol=1e-5, atol=1e-6,
        )
    np.testing.assert_allclose(
        np.asarray(s_dev.badge_grad_embedding(raw)),
        np.asarray(s_host.badge_grad_embedding(normed)),
        rtol=1e-4, atol=1e-5,
    )
