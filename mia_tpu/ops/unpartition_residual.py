"""Fused window-unpartition + residual-add + LayerNorm Pallas kernel.

The symmetric twin of ``ops/ln_window.py``: every windowed SAM encoder
block ends with ``x = shortcut + window_unpartition(attn_out)`` followed by
``y = LayerNorm(x)`` feeding the MLP (reference
``image_encoder.py:119-182`` — there the unpartition is a reshape/
transpose, the add an eager op, and norm2 an f32-upcast pass). In XLA
that is an unpartition copy (a strided sublane shuffle each way), a
separate residual add, and an LN fusion with bf16↔f32 converts — three
HBM round trips over the (B, H, W, C) residual stream per block, and the
partition copy again in the backward. This kernel fuses all three into
ONE HBM pass each way.

Same Mosaic shape rules as ``ln_window.py`` drive the design: the grid
cell is (sample, window-row band); the windowed operand block is
(nwx, ws, ws, C) (the 4D layout the attention path's token-major output
bitcasts to for free), bands are joined with static column slices + one
concat (no in-kernel reshapes), and the kernel writes BOTH the new
residual stream ``x_new = shortcut + unpart(win)`` and ``y = LN(x_new)``
as full-width bands. The LayerNorm math is the exact
``flax.linen.normalization`` operation order, so ``y`` is bit-compatible
with ``nn.LayerNorm(eps)(x_new)``.

Backward: residuals are ``x_new`` (alive anyway — it IS the block's
output residual stream) plus the banded μ/rstd stats. One kernel
computes the LN VJP, adds the residual-stream cotangent, and emits the
total BOTH as a grid band (the shortcut cotangent) and carved into
window tiles (the attention-output cotangent, zero at pad slots exactly
as the unpartition slice-VJP produces).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .ln_window import _band_stats, _carve, _geometry


def unpartition_add_ln_available(c: int, ws: int, interpret: bool,
                                 w: int | None = None) -> bool:
    """Can the fused unpartition+add+LN kernel tile this config on TPU?"""
    if interpret:
        return True
    if c % 128 != 0:
        return False
    band_w = w if w is not None else 4 * ws
    # f32 bands: joined attn, shortcut, x_new, y + window tiles
    return ws * band_w * c * 4 * 6 < 48 * 2**20


def _join_band(win_ref, nwx, ws, w, dtype=jnp.float32):
    """Join the nwx window tiles of one band back to (ws, W, C) — static
    column slices + ONE concat, no reshapes (ln_window.py's pattern)."""
    parts = []
    for wx in range(nwx):
        x0 = wx * ws
        x1 = min(x0 + ws, w)
        parts.append(win_ref[wx].astype(dtype)[:, : x1 - x0])
    return parts[0] if nwx == 1 else jnp.concatenate(parts, axis=1)


def _fwd_kernel(win_ref, sc_ref, scale_ref, bias_ref, *out_refs, ws, h, w,
                c, nwx, eps, full_outputs):
    i = pl.program_id(1)
    att = _join_band(win_ref, nwx, ws, w)  # (ws, W, C) f32
    sc = sc_ref[0].astype(jnp.float32)
    # residual add in f32, rounded to the stream dtype BEFORE the LN stats
    # (bit-matching ``shortcut + x`` then ``LayerNorm`` on the rounded sum)
    xnew = (sc + att).astype(out_refs[0].dtype)
    xf, valid, mu, rstd = _band_stats(xnew, i, ws, h, w, eps)
    scale = scale_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)
    y = (xf - mu) * (rstd * scale[None, None, :]) + bias[None, None, :]
    out_refs[0][0] = xnew
    out_refs[1][0] = y.astype(out_refs[1].dtype)
    if full_outputs:
        out_refs[2][0] = mu[..., 0]
        out_refs[3][0] = rstd[..., 0]


def _fwd_impl(windows, shortcut, scale, bias, ws, h, w, eps, interpret,
              full_outputs):
    b, _, _, c = shortcut.shape
    nwy, nwx, nw = _geometry(h, w, ws)
    grid = (b, nwy)
    row = lambda bb, i: (bb * nwy + i, 0, 0, 0)  # noqa: E731
    band3 = lambda bb, i: (bb * nwy + i, 0, 0)  # noqa: E731
    band4 = lambda bb, i: (bb, i, 0, 0)  # noqa: E731
    out_shape = [
        jax.ShapeDtypeStruct((b, h, w, c), shortcut.dtype),
        jax.ShapeDtypeStruct((b, h, w, c), shortcut.dtype),
    ]
    out_specs = [
        pl.BlockSpec((1, ws, w, c), band4),
        pl.BlockSpec((1, ws, w, c), band4),
    ]
    if full_outputs:
        out_shape += [
            jax.ShapeDtypeStruct((b * nwy, ws, w), jnp.float32),
            jax.ShapeDtypeStruct((b * nwy, ws, w), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((1, ws, w), band3),
            pl.BlockSpec((1, ws, w), band3),
        ]
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, ws=ws, h=h, w=w, c=c, nwx=nwx, eps=eps,
            full_outputs=full_outputs,
        ),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nwx, ws, ws, c), row),
            pl.BlockSpec((1, ws, w, c), band4),
            pl.BlockSpec((1, c), lambda bb, i: (0, 0)),
            pl.BlockSpec((1, c), lambda bb, i: (0, 0)),
        ],
        out_specs=out_specs,
        interpret=interpret,
    )(windows, shortcut, scale.reshape(1, c), bias.reshape(1, c))
    return out


def _bwd_kernel(xnew_ref, dxn_ref, dy_ref, mu_ref, rstd_ref, scale_ref,
                dsc_out_ref, dwin_ref, dscale_ref, dbias_ref, *, ws, h, w,
                c, nwx):
    i = pl.program_id(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (ws, w, 1), 0) + i * ws
    valid = rows < h
    dy = jnp.where(valid, dy_ref[0].astype(jnp.float32), 0.0)
    xf = jnp.where(valid, xnew_ref[0].astype(jnp.float32), 0.0)
    mu = mu_ref[0][..., None]
    rstd = rstd_ref[0][..., None]
    xhat = (xf - mu) * rstd
    scale = scale_ref[0].astype(jnp.float32)
    g = dy * scale[None, None, :]
    m1 = jnp.mean(g, axis=-1, keepdims=True)
    m2 = jnp.mean(g * xhat, axis=-1, keepdims=True)
    dxn = jnp.where(valid, dxn_ref[0].astype(jnp.float32), 0.0)
    total = dxn + rstd * (g - m1 - xhat * m2)
    dsc_out_ref[0] = total.astype(dsc_out_ref.dtype)
    for wx in range(nwx):
        dwin_ref[wx] = _carve(total, wx, ws, w).astype(dwin_ref.dtype)
    dscale_ref[0, 0] = jnp.sum(dy * xhat, axis=(0, 1))
    dbias_ref[0, 0] = jnp.sum(dy, axis=(0, 1))


def _bwd_impl(xnew, dxn, dy, mu, rstd, scale, ws, h, w, interpret,
              win_dtype):
    b, _, _, c = xnew.shape
    nwy, nwx, nw = _geometry(h, w, ws)
    grid = (b, nwy)
    row = lambda bb, i: (bb * nwy + i, 0, 0, 0)  # noqa: E731
    band3 = lambda bb, i: (bb * nwy + i, 0, 0)  # noqa: E731
    band4 = lambda bb, i: (bb, i, 0, 0)  # noqa: E731
    dsc, dwin, dscale, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, ws=ws, h=h, w=w, c=c, nwx=nwx),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), xnew.dtype),
            jax.ShapeDtypeStruct((b * nw, ws, ws, c), win_dtype),
            jax.ShapeDtypeStruct((b * nwy, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b * nwy, 1, c), jnp.float32),
        ],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ws, w, c), band4),
            pl.BlockSpec((1, ws, w, c), band4),
            pl.BlockSpec((1, ws, w, c), band4),
            pl.BlockSpec((1, ws, w), band3),
            pl.BlockSpec((1, ws, w), band3),
            pl.BlockSpec((1, c), lambda bb, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, ws, w, c), band4),
            pl.BlockSpec((nwx, ws, ws, c), row),
            pl.BlockSpec((1, 1, c), band3),
            pl.BlockSpec((1, 1, c), band3),
        ],
        interpret=interpret,
    )(xnew, dxn, dy, mu, rstd, scale.reshape(1, c))
    return (
        dwin,
        dsc,
        dscale.reshape(b * nwy, c).sum(0),
        dbias.reshape(b * nwy, c).sum(0),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _unpartition_add_ln(windows, shortcut, scale, bias, ws, h, w, eps,
                        interpret):
    xnew, y = _fwd_impl(windows, shortcut, scale, bias, ws, h, w, eps,
                        interpret, full_outputs=False)
    return xnew, y


def _vjp_fwd(windows, shortcut, scale, bias, ws, h, w, eps, interpret):
    xnew, y, mu, rstd = _fwd_impl(windows, shortcut, scale, bias, ws, h, w,
                                  eps, interpret, full_outputs=True)
    win_proto = jnp.zeros((0,), windows.dtype)
    return (xnew, y), (xnew, mu, rstd, scale, win_proto)


def _vjp_bwd(ws, h, w, eps, interpret, residuals, cotangents):
    xnew, mu, rstd, scale, win_proto = residuals
    dxn, dy = cotangents
    dwin, dsc, dscale, dbias = _bwd_impl(
        xnew, dxn, dy, mu, rstd, scale, ws, h, w, interpret, win_proto.dtype
    )
    return dwin, dsc, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


_unpartition_add_ln.defvjp(_vjp_fwd, _vjp_bwd)


def unpartition_add_ln(windows, shortcut, scale, bias, window_size: int,
                       eps: float = 1e-6, interpret: bool = False):
    """``x_new = shortcut + window_unpartition(windows)``;
    ``y = LayerNorm(x_new)`` — one fused HBM pass; returns ``(x_new, y)``.

    windows: (B·nW, ws, ws, C) — attention-block output still in the
    partitioned layout (pad-slot values are ignored, exactly like the
    unpartition slice). shortcut: (B, H, W, C) residual stream.
    scale, bias: (C,) LayerNorm (norm2) params.
    """
    b, h, w, c = shortcut.shape
    return _unpartition_add_ln(windows, shortcut, scale, bias,
                               int(window_size), int(h), int(w), float(eps),
                               interpret)
