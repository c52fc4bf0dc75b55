"""Affine warping (the shared geometric resampler).

One gather-based inverse warp backs every geometric augmentation (affine,
rotation, and their random variants — reference
``src/transforms/joint_transform.py:100-206``). Semantics follow torchvision
``F.affine`` on tensors: rotation about the image center at pixel
``((w-1)/2, (h-1)/2)``, bilinear (image) or nearest (label) sampling, zero
fill outside the source.

All inputs are channel-last ``(H, W, C)``; use ``jax.vmap`` for batches. The
matrix parameters may be traced values, so a single compiled program serves
every randomly-sampled set of augmentation parameters.
"""

from __future__ import annotations

import jax.numpy as jnp


def affine_inverse_matrix(
    angle_deg: jnp.ndarray,
    translate: tuple[jnp.ndarray, jnp.ndarray] | jnp.ndarray,
    scale: jnp.ndarray,
    shear_deg: tuple[jnp.ndarray, jnp.ndarray] | jnp.ndarray,
    center: tuple[float, float],
) -> jnp.ndarray:
    """Output-pixel -> input-pixel 2x3 matrix, torchvision convention.

    ``center``/``translate`` are in (x, y) pixel order. Computes the inverse
    of ``T(translate) C RotateShearScale C^-1`` as torchvision's
    ``_get_inverse_affine_matrix`` does.
    """
    translate = jnp.asarray(translate, dtype=jnp.float32)
    shear_deg = jnp.asarray(shear_deg, dtype=jnp.float32)
    rot = jnp.deg2rad(jnp.asarray(angle_deg, dtype=jnp.float32))
    sx = jnp.deg2rad(shear_deg[0])
    sy = jnp.deg2rad(shear_deg[1])
    cx, cy = center
    tx, ty = translate[0], translate[1]

    a = jnp.cos(rot - sy) / jnp.cos(sy)
    b = -jnp.cos(rot - sy) * jnp.tan(sx) / jnp.cos(sy) - jnp.sin(rot)
    c = jnp.sin(rot - sy) / jnp.cos(sy)
    d = -jnp.sin(rot - sy) * jnp.tan(sx) / jnp.cos(sy) + jnp.cos(rot)

    inv_scale = 1.0 / jnp.asarray(scale, dtype=jnp.float32)
    m00, m01 = d * inv_scale, -b * inv_scale
    m10, m11 = -c * inv_scale, a * inv_scale

    m02 = m00 * (-cx - tx) + m01 * (-cy - ty) + cx
    m12 = m10 * (-cx - tx) + m11 * (-cy - ty) + cy

    return jnp.stack(
        [jnp.stack([m00, m01, m02]), jnp.stack([m10, m11, m12])]
    )


def _sample_bilinear(image: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with zero padding outside. image (H,W,C), xs/ys (H',W')."""
    h, w = image.shape[0], image.shape[1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = None
    for dy, wy_ in ((0, 1.0 - wy), (1, wy)):
        for dx, wx_ in ((0, 1.0 - wx), (1, wx)):
            xi = x0i + dx
            yi = y0i + dy
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            v = image[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
            v = jnp.where(valid[..., None], v, 0.0)
            term = v * (wx_ * wy_)[..., None]
            out = term if out is None else out + term
    return out


def _sample_nearest(image: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Nearest sample with zero padding outside (grid_sample 'nearest')."""
    h, w = image.shape[0], image.shape[1]
    # grid_sample nearest uses round-half-to-even (nearbyint).
    xi = jnp.round(xs).astype(jnp.int32)
    yi = jnp.round(ys).astype(jnp.int32)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    v = image[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
    return jnp.where(valid[..., None], v, 0)


def affine_warp(
    image: jnp.ndarray,
    matrix: jnp.ndarray,
    method: str = "bilinear",
) -> jnp.ndarray:
    """Apply a 2x3 output->input pixel matrix to ``(H, W, C)``."""
    h, w = image.shape[0], image.shape[1]
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    src_x = matrix[0, 0] * xs + matrix[0, 1] * ys + matrix[0, 2]
    src_y = matrix[1, 0] * xs + matrix[1, 1] * ys + matrix[1, 2]

    if method == "bilinear":
        orig = image.dtype
        out = _sample_bilinear(image.astype(jnp.float32), src_x, src_y)
        return out.astype(orig) if jnp.issubdtype(orig, jnp.floating) else out
    if method == "nearest":
        return _sample_nearest(image, src_x, src_y)
    raise ValueError(f"unknown warp method: {method}")


def rotate_warp(image: jnp.ndarray, angle_deg: jnp.ndarray, method: str = "bilinear") -> jnp.ndarray:
    """torchvision ``F.rotate`` (no expand): affine with rotation only."""
    h, w = image.shape[0], image.shape[1]
    center = ((w - 1) * 0.5, (h - 1) * 0.5)
    m = affine_inverse_matrix(angle_deg, (0.0, 0.0), 1.0, (0.0, 0.0), center)
    return affine_warp(image, m, method=method)


def affine_warp_twopass(
    image: jnp.ndarray, matrix: jnp.ndarray, method: str = "nearest"
) -> jnp.ndarray:
    """Affine nearest warp as two chained one-hot einsum passes.

    XLA lowers the per-element 2-D gather of ``affine_warp`` to a
    scalarized loop on TPU (~143 ms for a 128×256² batch); expressing the
    same sampling as ``one_hot(idx) @ rows`` einsums hits the fused
    broadcast-compare + matmul path instead (~20 ms, 7×). The row
    coordinate is rounded before the column coordinate is evaluated
    (shear-style decomposition), so sampled positions can differ from the
    exact warp by ONE source pixel near rounding boundaries when the map
    mixes axes (rotation/shear); axis-aligned maps (scale/translate,
    ``matrix[0,1] == 0``) and identity are EXACT. Requires ``|matrix[1,1]|``
    not tiny — callers should fall back to ``affine_warp`` beyond ~±45°
    rotations. Zero fill outside the source, like ``affine_warp``.
    """
    if method != "nearest":
        raise ValueError("affine_warp_twopass supports nearest sampling only")
    import jax

    h, w = image.shape[0], image.shape[1]
    m00, m01, m02 = matrix[0, 0], matrix[0, 1], matrix[0, 2]
    m10, m11, m12 = matrix[1, 0], matrix[1, 1], matrix[1, 2]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    sy = m10 * xs + m11 * ys + m12  # (H_out, W_out)
    yi = jnp.round(sy).astype(jnp.int32)
    yvalid = (yi >= 0) & (yi < h)

    safe_m11 = jnp.where(jnp.abs(m11) < 1e-3, 1e-3, m11)
    b = m01 / safe_m11
    a = m00 - b * m10
    c = m02 - b * m12
    ii = jnp.arange(h, dtype=jnp.float32)[:, None]
    sx = a * xs + b * ii + c  # x-coordinate per (source row, output col)
    xi = jnp.round(sx).astype(jnp.int32)
    xvalid = (xi >= 0) & (xi < w)

    x32 = image.astype(jnp.float32)
    ohx = jax.nn.one_hot(jnp.clip(xi, 0, w - 1), w, dtype=jnp.float32)
    mid = jnp.einsum("iwj,ijc->iwc", ohx, x32)
    mid = jnp.where(xvalid[..., None], mid, 0.0)
    ohy = jax.nn.one_hot(jnp.clip(yi, 0, h - 1), h, dtype=jnp.float32)
    out = jnp.einsum("owi,iwc->owc", ohy, mid)
    out = jnp.where(yvalid[..., None], out, 0.0)
    if jnp.issubdtype(image.dtype, jnp.floating):
        return out.astype(image.dtype)
    return jnp.round(out).astype(image.dtype)
