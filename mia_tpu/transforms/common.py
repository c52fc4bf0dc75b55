"""Transform algebra: pure ``(rng, image, label) -> (image, label)`` ops.

The reference's transform protocol (``src/transforms/common.py:12-82``) is a
stateful host-side ``__call__(data: dict)`` drawing from torch's global RNG.
Here every transform is a frozen-config pure function taking an explicit JAX
key, so an entire augmentation recipe jits into ONE fused XLA program and
``vmap``s across the batch — augmentation runs on device, overlapped with
the train step, instead of in DataLoader worker processes.

Combinators:
- ``RandomTransform(t, p)`` — Bernoulli gate via ``lax.cond``
- ``RandomChoiceTransform(ts, w)`` — weighted pick via ``lax.switch``
- ``ComposeTransform(ts)`` — sequence, fresh key per stage

``get_params_dict()`` is preserved for the JSON recipe logging the trainer
emits (``al_trainer.py:921-924``).

Layout: image ``(H, W, C)`` float32 in [0, 1]; label ``(H, W)`` int32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Transform:
    def apply(self, rng, image, label):
        raise NotImplementedError

    def __call__(self, rng, image, label):
        return self.apply(rng, image, label)

    def get_params_dict(self) -> dict:
        return {type(self).__name__: {}}


class Identity(Transform):
    def apply(self, rng, image, label):
        return image, label


class RandomTransform(Transform):
    """Apply ``transform`` with probability ``p`` (``common.py:22-40``)."""

    def __init__(self, transform: Transform, p: float):
        self.p = float(min(max(p, 0.0), 1.0))
        self.transform = transform

    def apply(self, rng, image, label):
        gate_rng, t_rng = jax.random.split(rng)
        u = jax.random.uniform(gate_rng)
        return jax.lax.cond(
            u < self.p,
            lambda args: self.transform.apply(*args),
            lambda args: (args[1], args[2]),
            (t_rng, image, label),
        )

    def get_params_dict(self):
        return {
            "RandomTransform": {
                "p": self.p,
                "transform": self.transform.get_params_dict(),
            }
        }


class RandomChoiceTransform(Transform):
    """Pick one transform by (optionally weighted) multinomial
    (``common.py:43-64``)."""

    def __init__(self, transforms: list[Transform], weight: list | None = None):
        self.transforms = list(transforms)
        if weight is None:
            weight = [1.0] * len(transforms)
        self.weight = [float(w) for w in weight]

    def apply(self, rng, image, label):
        pick_rng, t_rng = jax.random.split(rng)
        logits = jnp.log(jnp.asarray(self.weight, jnp.float32))
        idx = jax.random.categorical(pick_rng, logits)
        branches = [
            (lambda args, t=t: t.apply(*args)) for t in self.transforms
        ]
        return jax.lax.switch(idx, branches, (t_rng, image, label))

    def get_params_dict(self):
        return {
            "RandomChoiceTransform": {
                "weights": self.weight,
                "transforms": [t.get_params_dict() for t in self.transforms],
            }
        }


class ComposeTransform(Transform):
    def __init__(self, transforms: list[Transform]):
        self.transforms = list(transforms)

    def apply(self, rng, image, label):
        for t in self.transforms:
            rng, t_rng = jax.random.split(rng)
            image, label = t.apply(t_rng, image, label)
        return image, label

    def get_params_dict(self):
        return {
            "ComposeTransform": {
                "transforms": [t.get_params_dict() for t in self.transforms]
            }
        }


def batch_apply(transform: Transform, rng, images, labels):
    """vmap a transform over a batch with per-sample keys (jit this)."""
    keys = jax.random.split(rng, images.shape[0])
    return jax.vmap(transform.apply)(keys, images, labels)
