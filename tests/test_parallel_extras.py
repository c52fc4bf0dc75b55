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
