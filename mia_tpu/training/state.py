"""Train state: params + batch stats + optimizer, optax-backed.

Replaces the reference's imperative optimizer/scheduler plumbing
(``al_trainer.py:737-780``): adam/adamw/sgd with torch betas/momentum,
global-norm gradient clipping (``clip_grad_norm_(max_norm=grad_norm)``,
``al_trainer.py:1376-1378``), and the poly-warmup LR schedule — all fused
into one optax chain so the whole update is a single XLA program.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
            opt_state=new_opt_state,
        )


def make_optimizer(
    name: str = "adam",
    learning_rate: float | Callable = 1e-3,
    grad_clip: float | None = 10.0,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """torch-parity optimizers: adam/adamw betas (0.9, 0.999), sgd momentum 0.9
    (reference ``al_trainer.py:744-765``), preceded by global-norm clipping."""
    if name == "adam":
        # torch Adam applies weight_decay as L2 into the gradient
        opt = optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_learning_rate(learning_rate),
        )
    elif name == "adamw":
        opt = optax.adamw(
            learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
        )
    elif name == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.sgd(learning_rate, momentum=0.9),
        )
    else:
        raise ValueError(f'Optimizer "{name}" not supported')
    if grad_clip is not None:
        return optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt


def create_train_state(
    model,
    rng: jax.Array,
    sample_input: jnp.ndarray | None,
    tx: optax.GradientTransformation,
    variables: dict | None = None,
) -> TrainState:
    """Build a TrainState; pass ``variables`` (e.g. from a torch-checkpoint
    import) to skip the random init."""
    if variables is None:
        init_rng, drop_rng = jax.random.split(rng)
        variables = model.init(
            {"params": init_rng, "dropout": drop_rng}, sample_input, train=False
        )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
