"""Smoothing / degradation filters used by the augmentation pipeline.

Designed for jit with *traced* parameters: a fixed compiled program covers
every randomly-sampled sigma / scale, so augmentation never recompiles.

- ``gaussian_blur``: torchvision ``F.gaussian_blur`` semantics (reflect
  padding, truncated+normalized kernel) with a static maximum radius and a
  runtime-masked effective kernel size (reference
  ``src/transforms/image_transform.py:145-193`` draws the kernel size from
  sigma at runtime).
- ``simulate_low_res``: nearest-exact downsample to a traced low-res size
  followed by bilinear (align_corners=False) upsample back — the composite
  index math of torch ``interpolate(mode="nearest-exact")`` then
  ``interpolate(mode="bilinear")`` fused into one static-shape gather
  (reference ``src/transforms/image_transform.py:196-236``).

Arrays are channel-last ``(H, W, C)``; vmap for batches.
"""

from __future__ import annotations

import jax.numpy as jnp


def _blur_1d(x: jnp.ndarray, sigma: jnp.ndarray, kernel_radius: jnp.ndarray,
             max_radius: int, axis: int) -> jnp.ndarray:
    """Separable 1D gaussian pass along ``axis`` with reflect padding."""
    offsets = jnp.arange(-max_radius, max_radius + 1, dtype=jnp.float32)
    sigma = jnp.maximum(jnp.asarray(sigma, jnp.float32), 1e-12)
    w = jnp.exp(-0.5 * (offsets / sigma) ** 2)
    # Truncate to the runtime kernel size, then normalize (torch builds the
    # kernel at exactly `kernel_size` taps and softmax-normalizes the window).
    w = jnp.where(jnp.abs(offsets) <= kernel_radius, w, 0.0)
    w = w / jnp.sum(w)

    pad = [(0, 0)] * x.ndim
    pad[axis] = (max_radius, max_radius)
    xp = jnp.pad(x, pad, mode="reflect")

    out = jnp.zeros_like(x)
    n = x.shape[axis]
    for k in range(2 * max_radius + 1):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(k, k + n)
        out = out + w[k] * xp[tuple(sl)]
    return out


def gaussian_blur(
    image: jnp.ndarray,
    sigma: jnp.ndarray,
    kernel_size: jnp.ndarray | int,
    max_kernel_size: int = 13,
) -> jnp.ndarray:
    """Blur ``(H, W, C)`` with a (possibly traced) sigma and kernel size.

    ``kernel_size`` must be odd; ``max_kernel_size`` bounds the static
    unrolled support. Matches torchvision ``F.gaussian_blur`` for any
    ``kernel_size <= max_kernel_size``.
    """
    max_radius = (int(max_kernel_size) - 1) // 2
    radius = (jnp.asarray(kernel_size, jnp.int32) - 1) // 2
    x = image.astype(jnp.float32)
    x = _blur_1d(x, sigma, radius, max_radius, axis=0)
    x = _blur_1d(x, sigma, radius, max_radius, axis=1)
    return x.astype(image.dtype) if jnp.issubdtype(image.dtype, jnp.floating) else x


def _lowres_axis_indices(size: int, low_size: jnp.ndarray):
    """Index/weight arrays for down(nearest-exact, traced size)+up(bilinear)."""
    low_size = jnp.asarray(low_size, jnp.float32)
    i = jnp.arange(size, dtype=jnp.float32)
    # bilinear upsample low -> size (align_corners=False)
    src = (i + 0.5) * low_size / size - 0.5
    j0 = jnp.floor(src)
    frac = src - j0
    max_j = low_size - 1.0
    j0c = jnp.clip(j0, 0.0, max_j)
    j1c = jnp.clip(j0 + 1.0, 0.0, max_j)
    # nearest-exact downsample size -> low: low j samples orig floor((j+0.5)*size/low)
    def to_orig(j):
        o = jnp.floor((j + 0.5) * size / low_size)
        return jnp.clip(o, 0.0, size - 1.0).astype(jnp.int32)
    return to_orig(j0c), to_orig(j1c), frac.astype(jnp.float32)


def simulate_low_res(image: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Degrade ``(H, W, C)`` by per-axis factors ``scales = (sh, sw)``.

    ``low = int(scale * size)`` per axis (traced), nearest-exact down then
    bilinear up, exactly like the reference's SimulateLowRes.
    """
    h, w = image.shape[0], image.shape[1]
    scales = jnp.asarray(scales, jnp.float32)
    low_h = jnp.maximum(jnp.floor(scales[0] * h), 1.0)
    low_w = jnp.maximum(jnp.floor(scales[1] * w), 1.0)

    x = image.astype(jnp.float32)

    # The index selections run as one-hot einsums instead of gathers (XLA
    # scalarizes per-element gathers on TPU but fuses broadcast-compare
    # matmuls; same exact arithmetic).
    def axis_matrix(size, i0, i1, frac):
        j = jnp.arange(size, dtype=jnp.int32)[None, :]
        m0 = (i0[:, None] == j).astype(jnp.float32)
        m1 = (i1[:, None] == j).astype(jnp.float32)
        return m0 * (1.0 - frac)[:, None] + m1 * frac[:, None]

    i0, i1, fy = _lowres_axis_indices(h, low_h)
    x = jnp.einsum("oh,hwc->owc", axis_matrix(h, i0, i1, fy), x)

    j0, j1, fx = _lowres_axis_indices(w, low_w)
    x = jnp.einsum("ow,hwc->hoc", axis_matrix(w, j0, j1, fx), x)

    return x.astype(image.dtype) if jnp.issubdtype(image.dtype, jnp.floating) else x
