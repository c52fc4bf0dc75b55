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


# --------------------------------------------------------------------------
# Pallas shift+shared-map warp: speed-of-light nearest affine on TPU
# --------------------------------------------------------------------------


def _warp_shift2pass_indices(matrix, h, w):
    """Split the two-pass affine sampling into per-sample index vectors.

    The twopass einsum path evaluates ``xi = round(a*x + b*i + c)`` — a
    per-source-row one-hot, which forces a 3-D one-hot tensor (2.1 GB at
    batch 128) that XLA materializes and contracts at HBM speed with 4
    output lanes. Splitting the rounding as ``round(a*x + c) + round(b*i)``
    makes the map a SHARED per-sample one-hot (full-width MXU matmul) plus a
    per-row integer shift (barrel roll): exact whenever the map is
    axis-aligned (``b == 0``; scale/translate/identity), and within ONE
    source pixel of the twopass path otherwise (rotation/shear).

    Returns int32 vectors: ``ts (h,)`` per-source-row lane shift,
    ``m1 (w,)`` shared column map, ``us (w,)`` per-column row shift,
    ``m2 (h,)`` shared row map.
    """
    m00, m01, m02 = matrix[0, 0], matrix[0, 1], matrix[0, 2]
    m10, m11, m12 = matrix[1, 0], matrix[1, 1], matrix[1, 2]
    safe_m11 = jnp.where(jnp.abs(m11) < 1e-3, 1e-3, m11)
    b = m01 / safe_m11
    a = m00 - b * m10
    c = m02 - b * m12
    ii = jnp.arange(h, dtype=jnp.float32)
    xx = jnp.arange(w, dtype=jnp.float32)
    ts = jnp.round(b * ii).astype(jnp.int32)
    m1 = jnp.round(a * xx + c).astype(jnp.int32)
    us = jnp.round(m10 * xx).astype(jnp.int32)
    m2 = jnp.round(m11 * ii + m12).astype(jnp.int32)
    return ts, m1, us, m2


def affine_warp_shift2pass(
    image: jnp.ndarray, matrix: jnp.ndarray, method: str = "nearest"
) -> jnp.ndarray:
    """Reference (gather-based) implementation of the shift+shared-map
    sampling semantics of :func:`affine_warp_pallas` — used for tests and
    as the documentation of the exact index math. Zero fill outside."""
    if method != "nearest":
        raise ValueError("affine_warp_shift2pass supports nearest sampling only")
    h, w = image.shape[0], image.shape[1]
    ts, m1, us, m2 = _warp_shift2pass_indices(matrix, h, w)
    e1 = m1[None, :] + ts[:, None]  # (h_src, x_out) source column
    x32 = image.astype(jnp.float32)
    mid = jnp.take_along_axis(x32, jnp.clip(e1, 0, w - 1)[..., None], axis=1)
    mid = jnp.where(((e1 >= 0) & (e1 < w))[..., None], mid, 0.0)
    e2 = m2[:, None] + us[None, :]  # (o_out, x_out) source row
    out = jnp.take_along_axis(mid, jnp.clip(e2, 0, h - 1)[..., None], axis=0)
    out = jnp.where(((e2 >= 0) & (e2 < h))[..., None], out, 0.0)
    if jnp.issubdtype(image.dtype, jnp.floating):
        return out.astype(image.dtype)
    return jnp.round(out).astype(image.dtype)


def _warp_pallas_kernel(img_ref, ts_ref, m1_ref, us_ref, m2_ref, out_ref, *,
                        h: int, w: int):
    """Per-(sample, channel) VMEM-resident warp plane.

    ``img_ref``/``out_ref`` are (1, h, w) f32 blocks (lane axis W). Pass 1
    barrel-rolls each row left by ``ts`` lanes (per-row select at each
    power-of-two level) then applies the shared column map as one
    (h, w) @ (w, w) MXU matmul against an in-VMEM one-hot. Pass 2 is the
    mirror along the sublane axis: barrel roll rows up by ``us`` per column,
    then an (h, h) @ (h, w) matmul with the shared row map. All shift
    arithmetic is mod the axis length; out-of-source samples are zeroed
    from the exact SIGNED split indices, so mod-wrap never leaks values.
    """
    import jax
    from jax.experimental.pallas import tpu as pltpu

    x = img_ref[0]
    ts = ts_ref[...]  # (h, 1) signed per-row lane shift
    m1 = m1_ref[...]  # (1, w) signed shared column map
    us = us_ref[...]  # (1, w) signed per-column row shift
    m2 = m2_ref[...]  # (h, 1) signed shared row map

    # ---- pass 1: per-row lane shift (left by ts mod w), barrel decomposition
    tm = jnp.remainder(ts, w)
    for k in range(max(w - 1, 1).bit_length()):
        step = 1 << k
        bit = ((tm >> k) & 1) == 1
        x = jnp.where(bit, pltpu.roll(x, (w - step) % w, axis=1), x)

    # shifted value at lane j is x[row, (j + ts) mod w], so selecting lane
    # (m1 mod w) yields x[row, (m1 + ts) mod w]; the validity mask below
    # restricts to 0 <= m1 + ts < w where the mod is the identity
    jrow = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    m1f = (jrow == jnp.remainder(m1, w)).astype(jnp.float32)  # M1[j, xout]
    mid = jax.lax.dot_general(
        x, m1f, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    e1 = m1 + ts  # (h, w) broadcast: source column per (row, xout)
    mid = jnp.where((e1 >= 0) & (e1 < w), mid, 0.0)

    # ---- pass 2: per-column sublane shift (up by us mod h), same barrel
    um = jnp.remainder(us, h)
    for k in range(max(h - 1, 1).bit_length()):
        step = 1 << k
        bit = ((um >> k) & 1) == 1
        mid = jnp.where(bit, pltpu.roll(mid, (h - step) % h, axis=0), mid)

    icol = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
    m2f = (icol == jnp.remainder(m2, h)).astype(jnp.float32)  # M2[o, i]
    out = jax.lax.dot_general(
        m2f, mid, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    e2 = m2 + us  # (h, w) source row per (o, xout)
    out_ref[0] = jnp.where((e2 >= 0) & (e2 < h), out, 0.0)


def affine_warp_pallas_supported(h: int, w: int, c: int) -> bool:
    """Mosaic layout constraints for the per-channel warp kernel: W on the
    lane axis must be a multiple of 128, H a multiple of 8, and the VMEM
    working set (a few channel planes plus two one-hots) must fit."""
    vmem = 6 * (h * w + w * w + h * h) * 4
    return w % 128 == 0 and h % 8 == 0 and vmem < 64 * 2 ** 20


def affine_warp_pallas(
    image: jnp.ndarray, matrix: jnp.ndarray, method: str = "nearest",
    interpret: bool = False,
) -> jnp.ndarray:
    """Nearest affine warp as a Pallas program with one grid cell per
    channel plane (``jax.vmap`` extends the grid over the batch).

    Same split-rounding semantics as :func:`affine_warp_shift2pass` (exact
    for axis-aligned maps; <=1 source pixel from ``affine_warp_twopass`` on
    rotation/shear). vs the einsum twopass at batch 128/256^2: the one-hot
    never leaves VMEM and the sample is read and written exactly once
    (3-6x measured, docs/PERF.md).
    """
    if method != "nearest":
        raise ValueError("affine_warp_pallas supports nearest sampling only")
    import functools

    import jax
    from jax.experimental import pallas as pl

    h, w, c = image.shape
    if not affine_warp_pallas_supported(h, w, c):
        raise ValueError(f"unsupported warp shape {(h, w, c)}")
    ts, m1, us, m2 = _warp_shift2pass_indices(matrix, h, w)
    ts = ts[:, None]  # (h, 1)
    m1 = m1[None, :]
    us = us[None, :]
    m2 = m2[:, None]
    ximg = image.astype(jnp.float32).transpose(2, 0, 1)  # (c, h, w)
    vec = pl.BlockSpec((h, 1), lambda i: (0, 0))
    row = pl.BlockSpec((1, w), lambda i: (0, 0))
    out = pl.pallas_call(
        functools.partial(_warp_pallas_kernel, h=h, w=w),
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            vec, row, row, vec,
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        interpret=interpret,
    )(ximg, ts, m1, us, m2)
    out = out.transpose(1, 2, 0)
    if jnp.issubdtype(image.dtype, jnp.floating):
        return out.astype(image.dtype)
    return jnp.round(out).astype(image.dtype)
