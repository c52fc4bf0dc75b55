"""TwoWayTransformer (reference
``src/models/segment_anything/modeling/transformer.py:16-240``): sparse
tokens self-attend, cross-attend to image tokens both ways, with a
downsampled internal attention dim. Channel-last image embeddings
(B, H, W, C) flatten to (B, HW, C)."""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import MLPBlock


class Attention(nn.Module):
    """Attention with optional internal downsampling
    (``transformer.py:185-240``)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        internal_dim = self.embedding_dim // self.downsample_rate
        head_dim = internal_dim // self.num_heads

        def proj(x, name):
            return nn.Dense(internal_dim, dtype=self.dtype, name=name)(x)

        def heads(x):
            b, n, c = x.shape
            return x.reshape(b, n, self.num_heads, c // self.num_heads).transpose(0, 2, 1, 3)

        q = heads(proj(q, "q_proj"))
        k = heads(proj(k, "k_proj"))
        v = heads(proj(v, "v_proj"))

        attn = jnp.einsum(
            "bnqc,bnkc->bnqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(head_dim)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnqk,bnkc->bnqc", attn, v, preferred_element_type=jnp.float32)
        b, n_heads, n, c = out.shape
        out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(b, n, n_heads * c)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class MLPReLU(nn.Module):
    """SAM's transformer MLP uses ReLU (torch ``MLPBlock`` with act=ReLU)."""

    mlp_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
        x = nn.relu(x)
        return nn.Dense(dim, dtype=self.dtype, name="lin2")(x)


class TwoWayAttentionBlock(nn.Module):
    """(1) sparse self-attn, (2) sparse→image cross, (3) MLP,
    (4) image→sparse cross (``transformer.py:107-184``)."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = Attention(
                self.embedding_dim, self.num_heads, dtype=self.dtype, name="self_attn"
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + Attention(
                self.embedding_dim, self.num_heads, dtype=self.dtype, name="self_attn"
            )(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + Attention(
            self.embedding_dim,
            self.num_heads,
            self.attention_downsample_rate,
            dtype=self.dtype,
            name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(queries)

        queries = queries + MLPReLU(self.mlp_dim, dtype=self.dtype, name="mlp")(queries)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + Attention(
            self.embedding_dim,
            self.num_heads,
            self.attention_downsample_rate,
            dtype=self.dtype,
            name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int
    embedding_dim: int
    num_heads: int
    mlp_dim: int
    attention_downsample_rate: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe (B, H, W, C); point_embedding (B, N, C).

        Returns (queries (B, N, C), keys (B, HW, C)).
        """
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(image_pe.shape[0], h * w, c)

        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                embedding_dim=self.embedding_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                dtype=self.dtype,
                name=f"layer{i}",
            )(queries, keys, point_embedding, key_pe)

        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + Attention(
            self.embedding_dim,
            self.num_heads,
            self.attention_downsample_rate,
            dtype=self.dtype,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_final_attn")(queries)
        return queries, keys
