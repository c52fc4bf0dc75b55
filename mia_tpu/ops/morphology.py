"""On-device mathematical morphology and connected components.

Replaces the reference's host-side cv2/skimage kernels (SURVEY §2 "native
deps"): rect-kernel dilate/erode (``unet_processor.py:147-157``) become XLA
``reduce_window`` max/min filters; ``skimage.measure.label``
(``busi_dataset.py:152-169``, SAM prompt generation) becomes an iterative
min-label propagation that runs entirely on device with static shapes.

Masks are 2D ``(H, W)``; vmap for batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _window_reduce(mask: jnp.ndarray, radius: int, mode: str) -> jnp.ndarray:
    window = 2 * radius + 1
    if mode == "max":
        init, fn = -jnp.inf, lax.max
    else:
        init, fn = jnp.inf, lax.min
    x = mask.astype(jnp.float32)
    out = lax.reduce_window(
        x,
        jnp.asarray(init, jnp.float32),
        fn,
        window_dimensions=(window, window),
        window_strides=(1, 1),
        padding=((radius, radius), (radius, radius)),
    )
    return out.astype(mask.dtype)


def dilate(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Rect-kernel dilation, cv2.dilate(MORPH_RECT, 2r+1) semantics."""
    return _window_reduce(mask, radius, "max")


def erode(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Rect-kernel erosion. Border behaves as +inf (cv2 default), i.e. the
    implicit outside never erodes the interior — matched by using the mask's
    max dtype value at the border only for binary masks padded upstream; for
    the processor pipeline masks are explicitly zero-padded first, as in the
    reference (``unet_processor.py:83-100``)."""
    window = 2 * radius + 1
    x = mask.astype(jnp.float32)
    out = lax.reduce_window(
        x,
        jnp.asarray(jnp.inf, jnp.float32),
        lax.min,
        window_dimensions=(window, window),
        window_strides=(1, 1),
        padding=((radius, radius), (radius, radius)),
    )
    return out.astype(mask.dtype)


def fill_hole(mask: jnp.ndarray, dilate_radius: int, erode_radius: int) -> jnp.ndarray:
    """Morphological closing (dilate then erode), reference ``fill_hole``."""
    return erode(dilate(mask, dilate_radius), erode_radius)


def remove_cc(mask: jnp.ndarray, dilate_radius: int, erode_radius: int) -> jnp.ndarray:
    """Morphological opening (erode then dilate), reference ``remove_cc``."""
    return dilate(erode(mask, erode_radius), dilate_radius)


def connected_components(
    mask: jnp.ndarray, connectivity: int = 2, max_iters: int | None = None
) -> jnp.ndarray:
    """Label connected components of a binary mask on device.

    Scan-based min-label propagation: every foreground pixel starts with
    its linear index; each iteration sweeps labels along ENTIRE contiguous
    foreground runs with segmented associative min-scans (rows and columns,
    both directions, log-depth on the VPU — no gathers), plus one
    roll-min for the diagonal links of 8-connectivity. Convergence takes
    roughly one iteration per "turn" in the component geometry (2–4 for
    blob-like masks) instead of one per pixel of geodesic diameter; a
    pointer-jumping gather variant measured ~25× slower per step on TPU.

    Labels converge to the minimum linear pixel index of each component;
    background is -1. ``connectivity=2`` is 8-connectivity (skimage default
    used by the reference).
    """
    h, w = mask.shape
    fg = mask > 0
    big = jnp.int32(h * w)
    lab = jnp.where(
        fg, jnp.arange(h * w, dtype=jnp.int32).reshape(h, w), big
    )
    bg = ~fg

    def seg_op(a, c):
        # segmented running min: a boundary (background pixel) resets the run
        av, ab = a
        cv, cb = c
        return jnp.where(cb, cv, jnp.minimum(av, cv)), ab | cb

    def seg_scan(lab, axis, reverse):
        res, _ = lax.associative_scan(
            seg_op, (lab, bg), axis=axis, reverse=reverse
        )
        return res

    if connectivity == 2:
        diag_shifts = [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    else:
        diag_shifts = []

    def sweep(lab):
        for axis in (1, 0):
            lab = seg_scan(lab, axis, False)
            lab = seg_scan(lab, axis, True)
        # all diagonal mins read the SAME masked snapshot — sequential
        # updates would let labels chain across background pixels
        src = jnp.where(fg, lab, big)
        best = src
        for dy, dx in diag_shifts:
            shifted = jnp.roll(src, (dy, dx), axis=(0, 1))
            # roll wraps around; invalidate wrapped rows/cols
            if dy == 1:
                shifted = shifted.at[0, :].set(big)
            else:
                shifted = shifted.at[-1, :].set(big)
            if dx == 1:
                shifted = shifted.at[:, 0].set(big)
            else:
                shifted = shifted.at[:, -1].set(big)
            best = jnp.minimum(best, shifted)
        return jnp.where(fg, best, big)

    def cond(state):
        lab, changed, it = state
        return changed & (it < limit)

    def body(state):
        lab, _, it = state
        new = sweep(lab)
        return new, jnp.any(new != lab), it + 1

    limit = jnp.int32(max_iters if max_iters is not None else h * w)
    lab, _, _ = lax.while_loop(cond, body, (lab, jnp.bool_(True), jnp.int32(0)))
    return jnp.where(fg, lab, -1)


def _shift2d(x, dy: int, dx: int, fill):
    """Shift by (dy, dx) with ``fill`` entering at the vacated edge.

    Static shifts only — lowers to lane/sublane rotates + iota selects,
    all Mosaic-friendly (no gathers)."""
    h, w = x.shape
    y = x
    if dy:
        y = jnp.roll(y, dy, axis=0)
    if dx:
        y = jnp.roll(y, dx, axis=1)
    cond = None
    if dy or dx:
        ri = lax.broadcasted_iota(jnp.int32, (h, w), 0)
        ci = lax.broadcasted_iota(jnp.int32, (h, w), 1)
        conds = []
        if dy > 0:
            conds.append(ri < dy)
        elif dy < 0:
            conds.append(ri >= h + dy)
        if dx > 0:
            conds.append(ci < dx)
        elif dx < 0:
            conds.append(ci >= w + dx)
        cond = functools.reduce(jnp.logical_or, conds)
    return jnp.where(cond, fill, y) if cond is not None else y


def _cc_kernel(mask_ref, out_ref, *, max_iters: int, connectivity: int):
    """Whole-mask CC in VMEM: the same sweep schedule as
    :func:`connected_components` (segmented min-scans along rows and columns
    in both directions + masked diagonal roll-min), but with every sweep an
    on-chip vector op instead of an XLA while-loop iteration of small HBM
    round-trip ops (measured launch-latency-bound at ~6 GB/s in the CPC-SAM
    phase-2 profile). Hillis–Steele log-shift segmented scans."""
    h, w = mask_ref.shape
    fg = mask_ref[...] > 0
    bg = ~fg
    big = jnp.int32(h * w)
    idx = (
        lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    lab0 = jnp.where(fg, idx, big)

    bg_i = bg.astype(jnp.int32)  # Mosaic cannot rotate i1 vectors

    def seg_scan(v, axis: int, reverse: bool):
        # x_i <- combine(x_{i-d}, x_i) over pairs (value, boundary);
        # out-of-range reads act as boundaries (fill value BIG / 1)
        b = bg_i
        d = 1
        n = v.shape[axis]
        while d < n:
            sh = -d if reverse else d
            dy, dx = (sh, 0) if axis == 0 else (0, sh)
            sv = _shift2d(v, dy, dx, big)
            sb = _shift2d(b, dy, dx, jnp.int32(1))
            v = jnp.where(b != 0, v, jnp.minimum(v, sv))
            b = b | sb
            d *= 2
        return v

    if connectivity == 2:
        diag_shifts = [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    else:
        diag_shifts = []

    def sweep(lab):
        for axis in (1, 0):
            lab = seg_scan(lab, axis, False)
            lab = seg_scan(lab, axis, True)
        src = jnp.where(fg, lab, big)
        best = src
        for dy, dx in diag_shifts:
            best = jnp.minimum(best, _shift2d(src, dy, dx, big))
        return jnp.where(fg, best, big)

    lab = lax.fori_loop(0, max_iters, lambda _, v: sweep(v), lab0)
    out_ref[...] = jnp.where(fg, lab, -1)


def connected_components_pallas(
    mask: jnp.ndarray,
    connectivity: int = 2,
    max_iters: int = 16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Pallas TPU fast path for :func:`connected_components` with a fixed
    sweep budget. Identical labels to ``connected_components(mask,
    connectivity, max_iters)`` whenever the mask converges within
    ``max_iters`` sweeps (the sweep is idempotent at fixpoint, so running
    the full budget matches the early-exiting while-loop); parity-tested
    against the XLA path. vmap adds batch grid dimensions."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = mask.shape
    return pl.pallas_call(
        functools.partial(
            _cc_kernel, max_iters=max_iters, connectivity=connectivity
        ),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        interpret=interpret,
    )(mask.astype(jnp.int32))


def remove_small_regions(
    mask: jnp.ndarray, min_size: int, connectivity: int = 2
) -> jnp.ndarray:
    """Zero out connected components smaller than ``min_size`` pixels.

    Device-side equivalent of the reference's BUSI label cleanup
    (``busi_dataset.py:152-169``).
    """
    lab = connected_components(mask, connectivity=connectivity)
    flat = lab.reshape(-1)
    sizes = jnp.zeros(mask.size + 1, dtype=jnp.int32).at[
        jnp.where(flat >= 0, flat, mask.size)
    ].add(1)
    keep = sizes[jnp.where(flat >= 0, flat, mask.size)] >= min_size
    keep = keep.reshape(mask.shape) & (lab >= 0)
    return jnp.where(keep, mask, 0)


def component_sizes_and_largest(
    mask: jnp.ndarray, connectivity: int = 2, max_iters: int | None = None
):
    """Return (labels, size_map, largest_component_mask) for a binary mask.

    With a finite sweep budget on a TPU backend the labeling runs in the
    single-program Pallas kernel (one VMEM-resident program per mask instead
    of per-sweep HBM round trips); results are identical to the XLA path."""
    if max_iters is not None and jax.default_backend() == "tpu":
        lab = connected_components_pallas(
            mask, connectivity=connectivity, max_iters=max_iters
        )
    else:
        lab = connected_components(mask, connectivity=connectivity, max_iters=max_iters)
    flat = jnp.where(lab.reshape(-1) >= 0, lab.reshape(-1), mask.size)
    sizes = jnp.zeros(mask.size + 1, dtype=jnp.int32).at[flat].add(1)
    sizes = sizes.at[mask.size].set(0)
    size_map = sizes[flat].reshape(mask.shape)
    largest = (size_map == jnp.max(size_map)) & (lab >= 0)
    return lab, size_map, largest


def gaussian_blur_threshold_smooth(mask: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """cv2-style boundary smoothing: 0/255 blur then threshold at 127
    (reference ``unet_processor.py:159-164``)."""
    from .filters import gaussian_blur

    # cv2.GaussianBlur(sigma=0) derives sigma from kernel size.
    sigma = 0.3 * ((kernel_size - 1) * 0.5 - 1) + 0.8
    x = (mask > 0).astype(jnp.float32)[..., None] * 255.0
    blurred = gaussian_blur(x, sigma, kernel_size, max_kernel_size=kernel_size)[..., 0]
    return (blurred > 127).astype(mask.dtype)
