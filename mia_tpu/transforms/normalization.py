"""Z-score normalization (``src/transforms/normalization.py:9-26``).

torch ``Tensor.std()`` is Bessel-corrected (ddof=1); preserved here for
numeric parity.
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import Transform


def zscore_normalize(image: jnp.ndarray) -> jnp.ndarray:
    image = image.astype(jnp.float32)
    mean = jnp.mean(image)
    n = image.size
    var = jnp.sum(jnp.square(image - mean)) / jnp.maximum(n - 1, 1)
    std = jnp.sqrt(var)
    return (image - mean) / jnp.clip(std, 1e-8)


class ZScoreNormalize(Transform):
    def apply(self, rng, image, label):
        return zscore_normalize(image), label

    def get_params_dict(self):
        return {"ZScoreNormalize": {}}
