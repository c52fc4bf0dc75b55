"""Device-side distance kernels.

- ``pairwise_distances``: sklearn-compatible (l2 / cosine / l1) dense
  distance matrices via MXU matmuls — replaces the reference's
  ``sklearn.metrics.pairwise_distances`` (``coreset_selector.py:9``).
- ``squared_edt``: exact n-D squared Euclidean distance transform with
  anisotropic spacing, as a separable sequence of min-plus passes — replaces
  ``scipy.ndimage.distance_transform_edt`` inside medpy's surface metrics
  (``al_trainer.py:1551-1554``).
- ``surface_distance_stats``: directed surface distances (medpy border
  convention) reduced to max / mean / 95th percentile on device.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_BIG = 1.0e12


def pairwise_distances(
    x: jnp.ndarray, y: jnp.ndarray | None = None, metric: str = "l2"
) -> jnp.ndarray:
    """Dense (N, M) distance matrix. ``metric`` in {"l2", "cosine", "l1"}."""
    if y is None:
        y = x
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)

    if metric in ("l2", "euclidean"):
        x2 = jnp.sum(x * x, axis=1, keepdims=True)
        y2 = jnp.sum(y * y, axis=1, keepdims=True)
        d2 = x2 + y2.T - 2.0 * (x @ y.T)
        return jnp.sqrt(jnp.maximum(d2, 0.0))
    if metric == "cosine":
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        yn = y / jnp.maximum(jnp.linalg.norm(y, axis=1, keepdims=True), 1e-12)
        return jnp.clip(1.0 - xn @ yn.T, 0.0, 2.0)
    if metric in ("l1", "manhattan", "cityblock"):
        return jnp.sum(jnp.abs(x[:, None, :] - y[None, :, :]), axis=-1)
    raise ValueError(f"unknown metric: {metric}")


def _nearest_feature_distance_1d(feature: jnp.ndarray, spacing: float) -> jnp.ndarray:
    """Per-position distance to the nearest feature along axis 0.

    ``feature`` is boolean with shape (N, ...); returns float32 distances
    (BIG where a line has no features). Log-depth associative scans (a
    sequential lax.scan here costs N device steps — the former
    implementation dominated the CPC-SAM prompt-generation profile).
    """
    n = feature.shape[0]
    idx = jnp.arange(n, dtype=jnp.float32)

    ii = jnp.broadcast_to(
        idx.reshape((n,) + (1,) * (feature.ndim - 1)), feature.shape
    )
    # last feature index at-or-before i = running max of (i if feat else -BIG)
    last_fwd = lax.associative_scan(
        jnp.maximum, jnp.where(feature, ii, -_BIG), axis=0
    )
    # first feature index at-or-after i = reversed running min of (+BIG fill)
    last_bwd = lax.associative_scan(
        jnp.minimum, jnp.where(feature, ii, _BIG), axis=0, reverse=True
    )

    d_fwd = (ii - last_fwd) * spacing
    d_bwd = (last_bwd - ii) * spacing
    return jnp.minimum(
        jnp.where(last_fwd < 0, _BIG, d_fwd),
        jnp.where(last_bwd >= _BIG, _BIG, d_bwd),
    )


def _minplus_axis0(f2: jnp.ndarray, spacing: float, chunk: int = 32) -> jnp.ndarray:
    """out[i, ...] = min_k f2[k, ...] + ((i-k) * spacing)**2.

    Small axes (the capped prompt-generation resolutions) use ONE dense
    broadcast-min-reduce — XLA fuses the parabolic offsets into the reduce
    generator, no while loop. The former chunked ``lax.scan`` lowered to an
    HLO while whose per-step slices/pads were launch-latency-bound under
    the CPC-SAM phase-2 double-vmap (~70 ms/step of the profile); the dense
    reduce is one fusion. Large axes keep the chunked scan to bound the
    working set.
    """
    n = f2.shape[0]
    k = jnp.arange(n, dtype=jnp.float32)
    if n <= 256:
        off2 = ((k[:, None] - k[None, :]) * spacing) ** 2  # (i, k)
        off2 = off2.reshape((n, n) + (1,) * (f2.ndim - 1))
        return jnp.min(off2 + f2[None], axis=1)
    pad = (-n) % chunk
    starts = jnp.arange(0, n + pad, chunk)

    def step(_, s):
        i = s + jnp.arange(chunk, dtype=jnp.float32)
        off2 = ((i[:, None] - k[None, :]) * spacing) ** 2  # (chunk, n)
        off2 = off2.reshape((chunk, n) + (1,) * (f2.ndim - 1))
        out = jnp.min(off2 + f2[None], axis=1)
        return None, out

    _, chunks = lax.scan(step, None, starts)
    out = chunks.reshape((len(starts) * chunk,) + f2.shape[1:])
    return out[:n]


def squared_edt(feature: jnp.ndarray, spacing=None) -> jnp.ndarray:
    """Exact squared EDT to the nearest True pixel of ``feature`` (n-D).

    ``spacing`` may be a tuple of floats or a traced (ndim,) array — one
    compiled program then serves every anisotropic spacing.
    """
    nd = feature.ndim
    if spacing is None:
        spacing = (1.0,) * nd
    spacing = jnp.asarray(spacing, jnp.float32)
    # First axis: scan-based nearest feature (cheap), then square.
    d0 = _nearest_feature_distance_1d(feature, spacing[0])
    f2 = jnp.where(d0 >= _BIG, _BIG, d0 * d0)
    # Remaining axes: general min-plus with parabolic offsets.
    for axis in range(1, nd):
        f2m = jnp.moveaxis(f2, axis, 0)
        f2m = _minplus_axis0(f2m, spacing[axis])
        f2 = jnp.moveaxis(f2m, 0, axis)
    return f2


def binary_border(mask: jnp.ndarray) -> jnp.ndarray:
    """medpy border convention: mask XOR erosion(mask, cross, border 0).

    n-D: a foreground pixel is border if any face-neighbor (or the image
    edge) is background.
    """
    fg = mask > 0
    eroded = fg
    for axis in range(mask.ndim):
        pad_lo = [(0, 0)] * mask.ndim
        pad_lo[axis] = (1, 0)
        pad_hi = [(0, 0)] * mask.ndim
        pad_hi[axis] = (0, 1)
        sl_lo = [slice(None)] * mask.ndim
        sl_lo[axis] = slice(0, mask.shape[axis])
        sl_hi = [slice(None)] * mask.ndim
        sl_hi[axis] = slice(1, mask.shape[axis] + 1)
        lo = jnp.pad(fg, pad_lo, constant_values=False)[tuple(sl_lo)]
        hi = jnp.pad(fg, pad_hi, constant_values=False)[tuple(sl_hi)]
        eroded = eroded & lo & hi
    return fg & ~eroded


def _masked_percentile(values: jnp.ndarray, valid: jnp.ndarray, q: float) -> jnp.ndarray:
    """Linear-interpolated percentile of values[valid] (numpy 'linear')."""
    v = jnp.where(valid, values, jnp.inf)
    v = jnp.sort(v.reshape(-1))
    n = jnp.sum(valid)
    pos = q / 100.0 * (n.astype(jnp.float32) - 1.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, v.shape[0] - 1)
    hi = jnp.clip(lo + 1, 0, v.shape[0] - 1)
    frac = pos - lo.astype(jnp.float32)
    vlo = v[lo]
    vhi = jnp.where(hi < n, v[hi], vlo)
    return vlo + frac * (vhi - vlo)


def surface_distance_stats(
    pred: jnp.ndarray,
    ref: jnp.ndarray,
    spacing: tuple[float, ...] | jnp.ndarray | None = None,
):
    """All surface-distance reductions in one device program.

    Returns dict with hd (max symmetric), hd95 (95th pct of the pooled
    directed distances, medpy convention), asd (directed pred->ref mean),
    assd (symmetric mean). Caller handles empty-mask conventions.
    """
    nd = pred.ndim
    if spacing is None:
        sp = (1.0,) * nd
    else:
        sp = spacing  # tuple of floats or traced (ndim,) array

    pb = binary_border(pred)
    rb = binary_border(ref)
    dt_ref = jnp.sqrt(jnp.maximum(squared_edt(rb, sp), 0.0))
    dt_pred = jnp.sqrt(jnp.maximum(squared_edt(pb, sp), 0.0))

    d_p2r = jnp.where(pb, dt_ref, 0.0)
    d_r2p = jnp.where(rb, dt_pred, 0.0)
    n_p = jnp.sum(pb)
    n_r = jnp.sum(rb)

    hd1 = jnp.max(jnp.where(pb, dt_ref, -jnp.inf))
    hd2 = jnp.max(jnp.where(rb, dt_pred, -jnp.inf))
    hd = jnp.maximum(hd1, hd2)

    asd = jnp.sum(d_p2r) / jnp.maximum(n_p, 1)
    assd = (jnp.sum(d_p2r) + jnp.sum(d_r2p)) / jnp.maximum(n_p + n_r, 1)

    both = jnp.concatenate([
        jnp.where(pb, dt_ref, jnp.inf).reshape(-1),
        jnp.where(rb, dt_pred, jnp.inf).reshape(-1),
    ])
    valid = jnp.isfinite(both)
    hd95 = _masked_percentile(both, valid, 95.0)

    return {"hd": hd, "hd95": hd95, "asd": asd, "assd": assd}


# Public alias used by mia_tpu.metrics
surface_distances = surface_distance_stats
