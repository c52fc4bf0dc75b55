"""SAM prompt encoders (reference
``src/models/segment_anything/modeling/prompt_encoder.py`` and the
class-indexed ``prompt_encoder_prompt_class.py``).

Channel-last; label-conditional embedding adds use one-hot arithmetic
instead of boolean scatter so everything stays jittable. The random PE
Gaussian matrix is a parameter used through ``stop_gradient`` (a frozen
buffer in torch).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import LayerNorm2d


class PositionEmbeddingRandom(nn.Module):
    """Random-spatial-frequency PE (``prompt_encoder.py:172-215``)."""

    num_pos_feats: int = 64
    scale: float = 1.0

    def setup(self):
        self.gaussian_matrix = self.param(
            "positional_encoding_gaussian_matrix",
            lambda key, shape: self.scale * jax.random.normal(key, shape),
            (2, self.num_pos_feats),
        )

    def _matrix(self):
        return jax.lax.stop_gradient(self.gaussian_matrix)

    def _pe_encoding(self, coords):
        coords = 2 * coords - 1
        coords = coords.astype(jnp.float32) @ self._matrix()
        coords = 2 * np.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def __call__(self, size: Tuple[int, int]):
        """Dense grid PE → (H, W, C) (torch returns C, H, W)."""
        h, w = size
        y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(
            [jnp.broadcast_to(x[None, :], (h, w)), jnp.broadcast_to(y[:, None], (h, w))],
            axis=-1,
        )
        return self._pe_encoding(grid)

    def forward_with_coords(self, coords, image_size: Tuple[int, int]):
        coords = coords.astype(jnp.float32)
        coords = coords.at[..., 0].divide(image_size[1])
        coords = coords.at[..., 1].divide(image_size[0])
        return self._pe_encoding(coords)


class _MaskDownscaling(nn.Module):
    """4x mask downscaler (``prompt_encoder.py:52-60``): (B, 4H, 4W, 1) →
    (B, H, W, embed_dim)."""

    mask_in_chans: int
    embed_dim: int

    @nn.compact
    def __call__(self, masks):
        x = nn.Conv(self.mask_in_chans // 4, (2, 2), strides=(2, 2), name="conv1")(masks)
        x = LayerNorm2d(name="norm1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(self.mask_in_chans, (2, 2), strides=(2, 2), name="conv2")(x)
        x = LayerNorm2d(name="norm2")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Conv(self.embed_dim, (1, 1), name="conv3")(x)


class PromptEncoder(nn.Module):
    """Plain SAM prompt encoder (``prompt_encoder.py:16-170``)."""

    embed_dim: int
    image_embedding_size: Tuple[int, int]
    input_image_size: Tuple[int, int]
    mask_in_chans: int

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, self.embed_dim)
        )
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.mask_downscaling = _MaskDownscaling(self.mask_in_chans, self.embed_dim)

    def get_dense_pe(self):
        """(1, H, W, C) dense PE over the image-embedding grid."""
        return self.pe_layer(self.image_embedding_size)[None]

    def _embed_points(self, points, labels, pad: bool):
        points = points + 0.5
        if pad:
            points = jnp.concatenate(
                [points, jnp.zeros((points.shape[0], 1, 2))], axis=1
            )
            labels = jnp.concatenate(
                [labels, -jnp.ones((labels.shape[0], 1), labels.dtype)], axis=1
            )
        pe = self.pe_layer.forward_with_coords(points, self.input_image_size)
        invalid = (labels == -1)[..., None]
        pe = jnp.where(invalid, self.not_a_point_embed[0], pe)
        pe = pe + jnp.where((labels == 0)[..., None], self.point_embeddings[0], 0.0)
        pe = pe + jnp.where((labels == 1)[..., None], self.point_embeddings[1], 0.0)
        return pe

    def _embed_boxes(self, boxes):
        boxes = boxes + 0.5
        coords = boxes.reshape(-1, 2, 2)
        pe = self.pe_layer.forward_with_coords(coords, self.input_image_size)
        pe = pe.at[:, 0, :].add(self.point_embeddings[2])
        pe = pe.at[:, 1, :].add(self.point_embeddings[3])
        return pe

    def __call__(self, points=None, boxes=None, masks=None):
        if points is not None:
            bs = points[0].shape[0]
        elif boxes is not None:
            bs = boxes.shape[0]
        elif masks is not None:
            bs = masks.shape[0]
        else:
            bs = 1

        sparse = jnp.zeros((bs, 0, self.embed_dim))
        if points is not None:
            coords, labels = points
            sparse = jnp.concatenate(
                [sparse, self._embed_points(coords, labels, pad=boxes is None)], axis=1
            )
        if boxes is not None:
            box_pe = self._embed_boxes(boxes).reshape(bs, -1, self.embed_dim)
            sparse = jnp.concatenate([sparse, box_pe], axis=1)

        if masks is not None:
            dense = self.mask_downscaling(masks)
        else:
            h, w = self.image_embedding_size
            dense = jnp.broadcast_to(
                self.no_mask_embed.reshape(1, 1, 1, -1), (bs, h, w, self.embed_dim)
            )
        return sparse, dense


class PromptEncoderPromptClass(nn.Module):
    """Class-indexed prompt encoder (``prompt_encoder_prompt_class.py:16-202``):
    per-class learned point embeddings and per-class box-corner embeddings,
    selected by prompt labels."""

    embed_dim: int
    image_embedding_size: Tuple[int, int]
    input_image_size: Tuple[int, int]
    mask_in_chans: int
    num_classes: int = 4

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        self.point_embeddings = self.param(
            "point_embeddings",
            nn.initializers.normal(1.0),
            (self.num_classes, self.embed_dim),
        )
        self.box_corner_embeddings = self.param(
            "box_corner_embeddings",
            nn.initializers.normal(1.0),
            (self.num_classes * 2, self.embed_dim),
        )
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.mask_downscaling = _MaskDownscaling(self.mask_in_chans, self.embed_dim)

    def get_dense_pe(self):
        return self.pe_layer(self.image_embedding_size)[None]

    def _embed_points(self, points, labels, pad: bool):
        points = points + 0.5
        if pad:
            points = jnp.concatenate(
                [points, jnp.zeros((points.shape[0], 1, 2))], axis=1
            )
            labels = jnp.concatenate(
                [labels, -jnp.ones((labels.shape[0], 1), labels.dtype)], axis=1
            )
        pe = self.pe_layer.forward_with_coords(points, self.input_image_size)
        invalid = (labels == -1)[..., None]
        pe = jnp.where(invalid, self.not_a_point_embed[0], pe)
        # per-class embedding add via one-hot matmul (labels in 0..C-1)
        onehot = jax.nn.one_hot(jnp.clip(labels, 0, self.num_classes - 1), self.num_classes)
        class_add = onehot @ self.point_embeddings
        pe = pe + jnp.where(invalid, 0.0, class_add)
        return pe

    def _embed_boxes(self, boxes, labels):
        """boxes (B, N, 2, 2), labels (B, N) → (B, 2N, C)
        (``prompt_encoder_prompt_class.py:118-132``)."""
        boxes = boxes + 0.5
        b, n = boxes.shape[0], boxes.shape[1]
        coords = boxes.reshape(b, n * 2, 2)
        pe = self.pe_layer.forward_with_coords(coords, self.input_image_size)
        pe = pe.reshape(b, n, 2, self.embed_dim)
        onehot = jax.nn.one_hot(labels, self.num_classes)
        add0 = onehot @ self.box_corner_embeddings[: self.num_classes]
        add1 = onehot @ self.box_corner_embeddings[self.num_classes :]
        pe = pe.at[:, :, 0, :].add(add0)
        pe = pe.at[:, :, 1, :].add(add1)
        return pe.reshape(b, n * 2, self.embed_dim)

    def __call__(self, points=None, boxes=None, masks=None):
        if points is not None:
            bs = points[0].shape[0]
        elif boxes is not None:
            bs = boxes[0].shape[0]
        elif masks is not None:
            bs = masks.shape[0]
        else:
            bs = 1

        sparse = jnp.zeros((bs, 0, self.embed_dim))
        if points is not None:
            coords, labels = points
            sparse = jnp.concatenate(
                [sparse, self._embed_points(coords, labels, pad=boxes is None)], axis=1
            )
        if boxes is not None:
            coords, labels = boxes
            sparse = jnp.concatenate([sparse, self._embed_boxes(coords, labels)], axis=1)

        if masks is not None:
            dense = self.mask_downscaling(masks)
        else:
            h, w = self.image_embedding_size
            dense = jnp.broadcast_to(
                self.no_mask_embed.reshape(1, 1, 1, -1), (bs, h, w, self.embed_dim)
            )
        return sparse, dense
