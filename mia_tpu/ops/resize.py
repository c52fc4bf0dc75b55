"""Separable matrix-based image resize.

TPU-first design: a 2D resize is two dense (out, in) weight matrices applied
as matmuls over the H and W axes, so both passes run on the MXU and fuse with
surrounding element-wise work. The weight matrices are built with numpy at
trace time (all sizes are static under jit) and become XLA constants.

Semantics match torchvision ``F.resize`` (reference usage:
``src/transforms/joint_transform.py:24-25``, ``src/models/unet/unet_processor.py:41-47``):

- ``bilinear`` + ``antialias=True`` (torchvision default on tensors): the
  PIL-style triangle filter whose support scales with the downscale ratio.
- ``bilinear`` + ``antialias=False``: classic align_corners=False bilinear.
- ``nearest``: asymmetric nearest (``floor(i * in/out)``), torch's "nearest".
- ``nearest_exact``: ``floor((i + 0.5) * in/out)``, torch's "nearest-exact".

Arrays are channel-last: ``(..., H, W, C)``.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _nearest_index(out_size: int, in_size: int, exact: bool) -> np.ndarray:
    scale = in_size / out_size
    i = np.arange(out_size, dtype=np.float64)
    if exact:
        src = np.floor((i + 0.5) * scale)
    else:
        src = np.floor(i * scale)
    return np.clip(src, 0, in_size - 1).astype(np.int32)


@functools.lru_cache(maxsize=256)
def _resize_matrix(
    out_size: int, in_size: int, method: str, antialias: bool
) -> np.ndarray:
    """(out_size, in_size) row-stochastic interpolation matrix."""
    if method in ("nearest", "nearest_exact"):
        idx = _nearest_index(out_size, in_size, method == "nearest_exact")
        mat = np.zeros((out_size, in_size), dtype=np.float32)
        mat[np.arange(out_size), idx] = 1.0
        return mat

    if method != "bilinear":
        raise ValueError(f"unknown resize method: {method}")

    scale = in_size / out_size
    support = max(scale, 1.0) if antialias else 1.0
    centers = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    j = np.arange(in_size, dtype=np.float64)
    # Triangle filter evaluated at (j - center) / support, support-clamped.
    x = (j[None, :] - centers[:, None]) / support
    w = np.clip(1.0 - np.abs(x), 0.0, None)
    if not antialias:
        # Border handling: out-of-range taps collapse onto the edge pixel
        # (index clamping), which the plain triangle matrix misses.
        lo = np.clip(np.floor(centers).astype(np.int64), 0, in_size - 1)
        hi = np.clip(np.floor(centers).astype(np.int64) + 1, 0, in_size - 1)
        frac = centers - np.floor(centers)
        w = np.zeros((out_size, in_size), dtype=np.float64)
        np.add.at(w, (np.arange(out_size), lo), 1.0 - frac)
        np.add.at(w, (np.arange(out_size), hi), frac)
    row_sum = w.sum(axis=1, keepdims=True)
    row_sum[row_sum == 0] = 1.0
    return (w / row_sum).astype(np.float32)


def resize(
    image: jnp.ndarray,
    size: tuple[int, int],
    method: str = "bilinear",
    antialias: bool = True,
) -> jnp.ndarray:
    """Resize ``(..., H, W, C)`` to ``(..., size[0], size[1], C)``."""
    out_h, out_w = int(size[0]), int(size[1])
    in_h, in_w = image.shape[-3], image.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return image

    if method in ("nearest", "nearest_exact"):
        # Exact gather keeps integer dtypes intact (label maps).
        hi = _nearest_index(out_h, in_h, method == "nearest_exact")
        wi = _nearest_index(out_w, in_w, method == "nearest_exact")
        out = jnp.take(image, jnp.asarray(hi), axis=-3)
        out = jnp.take(out, jnp.asarray(wi), axis=-2)
        return out

    mh = jnp.asarray(_resize_matrix(out_h, in_h, method, antialias))
    mw = jnp.asarray(_resize_matrix(out_w, in_w, method, antialias))
    orig_dtype = image.dtype
    x = image.astype(jnp.float32)
    x = jnp.einsum("oh,...hwc->...owc", mh, x)
    x = jnp.einsum("ow,...hwc->...hoc", mw, x)
    if jnp.issubdtype(orig_dtype, jnp.floating):
        x = x.astype(orig_dtype)
    return x


def resize_longest_side(
    image: jnp.ndarray, target_length: int, method: str = "bilinear"
) -> jnp.ndarray:
    """SAM-style resize so the longest side equals ``target_length``.

    Mirrors the behavior of the reference's ``ResizeLongestSide``
    (``segment_anything/utils/transforms.py``) with static shapes.
    """
    h, w = image.shape[-3], image.shape[-2]
    scale = target_length / max(h, w)
    new_h, new_w = int(round(h * scale)), int(round(w * scale))
    return resize(image, (new_h, new_w), method=method)
