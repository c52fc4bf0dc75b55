"""Shared SAM modules (reference
``src/models/segment_anything/modeling/common.py:13-44``): MLPBlock and
LayerNorm2d. Channel-last layout makes LayerNorm2d a plain feature-axis
LayerNorm (torch's version normalizes the channel dim of NCHW)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MLPBlock(nn.Module):
    mlp_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(dim, dtype=self.dtype, name="lin2")(x)


class LayerNorm2d(nn.Module):
    """torch ``LayerNorm2d``: mean/var over the channel axis, eps 1e-6."""

    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) / jnp.sqrt(var + self.eps)
        weight = self.param("weight", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        return (y * weight + bias).astype(self.dtype)
