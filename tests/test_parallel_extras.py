"""Mesh-sharded pool scoring + profiling subsystem tests."""

import numpy as np

import jax
import jax.numpy as jnp

from mia_tpu.activelearning import ModelScorer
from mia_tpu.models.unet import UNet, UNetConfig
from mia_tpu.parallel import make_mesh
from mia_tpu.schedule import poly_warmup_schedule
from mia_tpu.training import create_train_state, make_optimizer
from mia_tpu.utils.profiling import phase_times, reset_phase_times, trace_span


def _scorer(mesh=None):
    cfg = UNetConfig(in_channels=1, out_classes=3, channels_list=(4, 8), dropout_prob=None)
    model = UNet(cfg)
    tx = make_optimizer("adam", poly_warmup_schedule(1e-3, 10, 0))
    state = create_train_state(model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), tx)
    return ModelScorer(model, state, mesh=mesh)


def test_sharded_scores_match_single_device(rng):
    mesh = make_mesh(("data",))
    images = jnp.asarray(rng.random((8, 32, 32, 1), np.float32))
    single = _scorer(None)
    sharded = _scorer(mesh)
    for kind in ("entropy", "confidence", "margin"):
        a = np.asarray(single.uncertainty(images, kind))
        b = np.asarray(sharded.uncertainty(images, kind))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(single.enc_feature(images)),
        np.asarray(sharded.enc_feature(images)),
        rtol=1e-4,
        atol=1e-5,
    )


def test_trace_span_registry():
    reset_phase_times()
    with trace_span("unit/test"):
        _ = jnp.ones((4,)).sum()
    times = phase_times()
    assert "unit/test" in times
    assert times["unit/test"]["count"] == 1
    assert times["unit/test"]["total_s"] >= 0


def test_eval_program_sharded_matches_single_device(tmp_path):
    """The device eval program runs sharded over the 8-virtual-device mesh
    and reproduces the single-device metrics (VERDICT r1 item 4 tail)."""
    import sys

    import numpy as np

    sys.path.insert(0, "tests")
    from synth_data import make_fugc

    from mia_tpu.training import ALTrainer

    root = tmp_path / "data"
    make_fugc(root, n_train=4, n_val=2, n_test=2, size=(32, 32))

    def build(mesh):
        trainer = ALTrainer(
            work_path=tmp_path / ("w_mesh" if mesh is not None else "w_single"),
            config=dict(
                seed=3, dataset="fugc", data_path=str(root), in_channels=3,
                num_classes=2, image_size=32, batch_size=2, valid_batch_size=1,
                valid_mode="slice", num_rounds=1, budget=1, num_iters=1,
                valid_freq_iter=10, do_augment=False, do_normalize=True,
                dropout_prob=0.0,
            ),
            verbose=False,
            mesh=mesh,
        )
        import dataclasses

        orig = trainer._unet_config

        def small():
            return dataclasses.replace(orig(), channels_list=(4, 8))

        trainer._unet_config = small
        trainer.initialize()
        trainer.on_train_start()
        return trainer

    rng = np.random.default_rng(11)
    images = rng.random((3, 37, 41, 3)).astype(np.float32)
    labels = rng.integers(0, 3, (3, 37, 41)).astype(np.int32)
    batch = {"image": images, "label": labels}

    t_single = build(None)
    a0, c0, l0 = t_single._eval_batch(batch)

    t_mesh = build(make_mesh(("data",)))
    # same weights so outputs are comparable
    t_mesh.state = t_mesh.state.replace(
        params=t_single.state.params, batch_stats=t_single.state.batch_stats
    )
    a1, c1, l1 = t_mesh._eval_batch(batch)

    np.testing.assert_allclose(a0, a1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(c0, c1, rtol=1e-4, atol=1e-5)
    assert abs(l0 - l1) < 1e-4


def test_sweep_pool_sharded_partial_final_batch(rng, tmp_path):
    """sweep_pool with the scorer's data sharding must survive a final
    batch the mesh can't divide (10 images, batch 8, 8 devices → final
    batch of 2): the loader falls back to default placement for it and
    sweep_pool's repeat-padding restores the jit's full batch shape."""
    import sys

    sys.path.insert(0, "tests")
    from synth_data import make_fugc

    from mia_tpu.activelearning.scorers import sweep_pool
    from mia_tpu.data import FUGCDataset

    root = tmp_path / "data"
    make_fugc(root, n_train=10, n_val=2, n_test=2, size=(32, 32))
    ds = FUGCDataset(data_path=str(root), split="train", image_size=(32, 32))

    cfg = UNetConfig(in_channels=3, out_classes=3, channels_list=(4, 8), dropout_prob=None)
    model = UNet(cfg)
    tx = make_optimizer("adam", poly_warmup_schedule(1e-3, 10, 0))
    state = create_train_state(model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), tx)
    mesh = make_mesh(("data",))
    sharded = ModelScorer(model, state, mesh=mesh)
    single = ModelScorer(model, state)

    s_scores, s_names = sweep_pool(
        ds, 8, lambda im: sharded.uncertainty(im, "entropy"),
        sharding=sharded.data_sharding,
    )
    scores, names = sweep_pool(ds, 8, lambda im: single.uncertainty(im, "entropy"))
    assert s_names == names and len(s_names) == 10
    np.testing.assert_allclose(s_scores, scores, rtol=1e-5, atol=1e-6)
