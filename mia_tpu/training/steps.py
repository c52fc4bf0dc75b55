"""Jitted train / eval / predict programs.

The reference's imperative ``train_step`` (``al_trainer.py:1350-1399``):
scheduler step → H2D copy → forward → DiceAndCELoss → backward →
clip_grad_norm → optimizer.step, with per-iteration host logging. Here the
whole update is ONE jitted program; the LR lives inside the optax chain, and
the returned metrics dict (loss/ce/dice/lr) is the only device→host traffic.

``make_train_step(..., mesh=...)`` returns the same program with
data-parallel shardings: batch split over the mesh's ``data`` axis, state
replicated; XLA inserts the gradient all-reduce over ICI (SURVEY §2.8).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .state import TrainState


def _forward(state: TrainState, params, batch_stats, images, train: bool, rng=None):
    variables = {"params": params}
    has_bn = bool(jax.tree_util.tree_leaves(batch_stats))
    if has_bn:
        variables["batch_stats"] = batch_stats
    kwargs = {}
    if train:
        kwargs["rngs"] = {"dropout": rng}
        if has_bn:
            kwargs["mutable"] = ["batch_stats"]
    out = state.apply_fn(variables, images, train=train, **kwargs)
    if train and has_bn:
        logits, mutated = out
        return logits, mutated["batch_stats"]
    return out, batch_stats


def make_train_step(
    loss_fn: Callable,
    lr_schedule: Callable | None = None,
    mesh=None,
    donate: bool = True,
    preprocess_fn: Callable | None = None,
    state_shardings=None,
):
    """Build ``step(state, images, labels, rng) -> (state, metrics)``.

    ``loss_fn(logits, labels) -> (total, ce, dice)`` or a scalar.
    ``images`` NHWC float32, ``labels`` (B, H, W) int.
    ``preprocess_fn(rng, images, labels) -> (images, labels)`` runs INSIDE the
    jitted program — this is where the fused on-device augmentation pipeline
    (``mia_tpu.transforms``) plugs in, replacing DataLoader-worker host
    augmentation (reference ``al_trainer.py:659-667``).
    ``state_shardings`` (with ``mesh``) overrides the default replicated
    state placement — pass ``mia_tpu.parallel.fsdp_shardings(state, mesh)``
    for ZeRO-style sharded params/optimizer state; XLA inserts the
    all-gathers on use and keeps gradients/updates sharded.
    """

    def train_step(state: TrainState, images, labels, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        if preprocess_fn is not None:
            aug_rng, step_rng = jax.random.split(step_rng)
            images, labels = preprocess_fn(aug_rng, images, labels)

        def loss_wrapped(params):
            logits, new_stats = _forward(state, params, state.batch_stats, images, True, step_rng)
            out = loss_fn(logits, labels)
            if isinstance(out, tuple):
                total, ce, dice = out
            else:
                total, ce, dice = out, jnp.zeros(()), jnp.zeros(())
            return total, (ce, dice, new_stats)

        (total, (ce, dice, new_stats)), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
        metrics = {"loss": total, "loss_ce": ce, "loss_dice": dice}
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    state_sh = state_shardings if state_shardings is not None else repl
    return jax.jit(
        train_step,
        in_shardings=(state_sh, data, data, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(loss_fn: Callable | None = None, mesh=None):
    """Build ``eval_step(state, images) -> probs`` (softmax, NHWC)."""

    def eval_step(state: TrainState, images):
        logits, _ = _forward(state, state.params, state.batch_stats, images, False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    if mesh is None:
        return jax.jit(eval_step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(eval_step, in_shardings=(repl, data), out_shardings=data)


def make_predict_fn(mesh=None):
    """Build ``predict(state, images) -> (probs, argmax)``."""

    def predict(state: TrainState, images):
        logits, _ = _forward(state, state.params, state.batch_stats, images, False)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return probs, jnp.argmax(probs, axis=-1).astype(jnp.int32)

    if mesh is None:
        return jax.jit(predict)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(predict, in_shardings=(repl, data), out_shardings=(data, data))
