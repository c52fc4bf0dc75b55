"""Fused LayerNorm + window-partition Pallas kernel for the SAM ViT.

Every windowed encoder block (8 of 12 in ViT-B) runs
``window_partition(LayerNorm(x))`` — in XLA that is an f32 LayerNorm
fusion (with bf16↔f32 converts on both sides) followed by a
reshape/transpose partition copy, and the backward pays the transposed
copy again. Together these are most of the encoder's residual
"data formatting" time (docs/PERF.md §8/§15: ~16 ms of an 80 ms ViT-B/512
fwd+bwd step). This kernel fuses them into ONE HBM pass each way.

Mosaic shape rules drive the design:

- block last-two dims must be (8,128)-divisible or equal to the array
  dims — a ws=14 window is only expressible when the ARRAY's own trailing
  dims are (ws, C), so the kernel reads **window-row bands** (grid cell =
  (sample, window-row); input block (ws, W, C), last two dims full) and
  writes the **4D windowed layout (B·nW, ws, ws, C)** directly (output
  block (nwx, ws, ws, C), last two dims full). The token-major (B·nW,
  ws², C) view the attention path wants is a contiguous row-major bitcast
  of this — free in XLA.
- a (14, 14, C)→(196, C) in-kernel reshape is an "unsupported shape
  cast" (14 % 8 != 0) — there are NO reshapes in these kernels; window
  tiles are carved/joined with static column slices and concats only.

Forward: LayerNorm math ONCE per band in f32 (fast variance clipped at 0,
``y = (x−μ)·(rsqrt(σ²+ε)·scale) + bias`` — the exact operation order of
``flax.linen.normalization``), zero-filled pad tokens (what the
reference's pre-partition ``jnp.pad`` produces,
``image_encoder.py:246-267``), then nwx sliced stores.

Backward: the VJP residuals are only the banded μ/rstd stats
((B·nwy, ws, W) f32 — XLA's own LN backward makes the same
save-stats-recompute-x̂ choice; the big x̂ tensor never touches HBM).
The kernel re-reads the x band (alive anyway as the block's residual
shortcut), joins the dy window tiles back to a band (static slices + one
concat), recomputes x̂, and runs the exact LayerNorm VJP once per band —
all VPU math on the banded layout, never on reshaped values (the
Mosaic-safe pattern of docs/PERF.md §6). dx is stored as one full-width
band; per-band dscale/dbias partials are summed outside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def ln_window_available(c: int, ws: int, interpret: bool,
                        w: int | None = None) -> bool:
    """Can the fused LN+partition kernel tile this config on TPU?"""
    if interpret:
        return True
    if c % 128 != 0:
        return False
    # conservative VMEM bound: the f32 band + two tile-sized temporaries
    band_w = w if w is not None else 4 * ws
    return ws * band_w * c * 4 * 4 < 48 * 2**20


def _geometry(h: int, w: int, ws: int):
    nwy = -(-h // ws)
    nwx = -(-w // ws)
    return nwy, nwx, nwy * nwx


def _carve(val, wx, ws, w):
    """Window tile wx of a (ws, W, …) band, zero-padded to ws cols."""
    x0 = wx * ws
    x1 = min(x0 + ws, w)
    tile = val[:, x0:x1]
    if x1 - x0 < ws:
        pad_shape = (ws, ws - (x1 - x0)) + val.shape[2:]
        tile = jnp.concatenate(
            [tile, jnp.zeros(pad_shape, tile.dtype)], axis=1
        )
    return tile


def _band_stats(band, i, ws, h, w, eps):
    """Masked f32 band + per-token LayerNorm stats (μ, rstd)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (ws, w, 1), 0) + i * ws
    valid = rows < h
    # zero OOB-read garbage BEFORE any arithmetic (0·NaN poisons outputs)
    xf = jnp.where(valid, band.astype(jnp.float32), 0.0)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    return xf, valid, mu, rstd


def _fwd_kernel(x_ref, scale_ref, bias_ref, *out_refs, ws, h, w, c, nwx,
                eps, full_outputs):
    i = pl.program_id(1)
    xf, valid, mu, rstd = _band_stats(x_ref[0], i, ws, h, w, eps)
    scale = scale_ref[0].astype(jnp.float32)  # (C,)
    bias = bias_ref[0].astype(jnp.float32)
    # flax _normalize order: mul = rsqrt(var+eps); mul *= scale;
    # y = (x - mean) * mul; y += bias
    y = (xf - mu) * (rstd * scale[None, None, :]) + bias[None, None, :]
    y = jnp.where(valid, y, 0.0)
    y_ref = out_refs[0]
    for wx in range(nwx):
        y_ref[wx] = _carve(y, wx, ws, w).astype(y_ref.dtype)
    if full_outputs:
        mu_ref, rstd_ref = out_refs[1], out_refs[2]
        mu_ref[0] = mu[..., 0]
        rstd_ref[0] = rstd[..., 0]


def _fwd_impl(x, scale, bias, ws, h, w, eps, interpret, full_outputs):
    b, _, _, c = x.shape
    nwy, nwx, nw = _geometry(h, w, ws)
    grid = (b, nwy)
    row = lambda bb, i: (bb * nwy + i, 0, 0, 0)  # noqa: E731
    band3 = lambda bb, i: (bb * nwy + i, 0, 0)  # noqa: E731
    out_shape = [jax.ShapeDtypeStruct((b * nw, ws, ws, c), x.dtype)]
    out_specs = [pl.BlockSpec((nwx, ws, ws, c), row)]
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
            pl.BlockSpec((1, ws, w, c), lambda bb, i: (bb, i, 0, 0)),
            pl.BlockSpec((1, c), lambda bb, i: (0, 0)),
            pl.BlockSpec((1, c), lambda bb, i: (0, 0)),
        ],
        out_specs=out_specs,
        interpret=interpret,
    )(x, scale.reshape(1, c), bias.reshape(1, c))
    return out if full_outputs else out[0]


def _bwd_kernel(x_ref, dy_ref, mu_ref, rstd_ref, scale_ref, dx_ref, dsc_ref,
                dbi_ref, *, ws, h, w, c, nwx):
    i = pl.program_id(1)
    # join the dy window tiles back to one (ws, W, C) band (static slices
    # + ONE concat; no reshapes)
    parts = []
    for wx in range(nwx):
        x0 = wx * ws
        x1 = min(x0 + ws, w)
        parts.append(dy_ref[wx].astype(jnp.float32)[:, : x1 - x0])
    dy = parts[0] if nwx == 1 else jnp.concatenate(parts, axis=1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (ws, w, 1), 0) + i * ws
    valid = rows < h
    # pad-slot cotangents die in the partition VJP (the reference's pad
    # slice); they must not reach dx or the scale/bias sums. Column pads
    # never enter the band; row pads are masked here.
    dy = jnp.where(valid, dy, 0.0)
    xf = jnp.where(valid, x_ref[0].astype(jnp.float32), 0.0)
    mu = mu_ref[0][..., None]
    rstd = rstd_ref[0][..., None]
    xhat = (xf - mu) * rstd
    scale = scale_ref[0].astype(jnp.float32)  # (C,)
    g = dy * scale[None, None, :]
    m1 = jnp.mean(g, axis=-1, keepdims=True)
    m2 = jnp.mean(g * xhat, axis=-1, keepdims=True)
    dx_ref[0] = (rstd * (g - m1 - xhat * m2)).astype(dx_ref.dtype)
    dsc_ref[0, 0] = jnp.sum(dy * xhat, axis=(0, 1))
    dbi_ref[0, 0] = jnp.sum(dy, axis=(0, 1))


def _bwd_impl(x, dy, mu, rstd, scale, ws, h, w, interpret):
    b, _, _, c = x.shape
    nwy, nwx, nw = _geometry(h, w, ws)
    grid = (b, nwy)
    row = lambda bb, i: (bb * nwy + i, 0, 0, 0)  # noqa: E731
    band3 = lambda bb, i: (bb * nwy + i, 0, 0)  # noqa: E731
    dx, dsc, dbi = pl.pallas_call(
        functools.partial(_bwd_kernel, ws=ws, h=h, w=w, c=c, nwx=nwx),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((b * nwy, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b * nwy, 1, c), jnp.float32),
        ],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ws, w, c), lambda bb, i: (bb, i, 0, 0)),
            pl.BlockSpec((nwx, ws, ws, c), row),
            pl.BlockSpec((1, ws, w), band3),
            pl.BlockSpec((1, ws, w), band3),
            pl.BlockSpec((1, c), lambda bb, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, ws, w, c), lambda bb, i: (bb, i, 0, 0)),
            pl.BlockSpec((1, 1, c), band3),
            pl.BlockSpec((1, 1, c), band3),
        ],
        interpret=interpret,
    )(x, dy, mu, rstd, scale.reshape(1, c))
    return dx, dsc.reshape(b * nwy, c).sum(0), dbi.reshape(b * nwy, c).sum(0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _ln_window_partition(x, scale, bias, ws, h, w, eps, interpret):
    return _fwd_impl(x, scale, bias, ws, h, w, eps, interpret,
                     full_outputs=False)


def _vjp_fwd(x, scale, bias, ws, h, w, eps, interpret):
    y, mu, rstd = _fwd_impl(x, scale, bias, ws, h, w, eps, interpret,
                            full_outputs=True)
    return y, (x, mu, rstd, scale)


def _vjp_bwd(ws, h, w, eps, interpret, residuals, dy):
    x, mu, rstd, scale = residuals
    dx, dsc, dbi = _bwd_impl(x, dy, mu, rstd, scale, ws, h, w, interpret)
    return dx, dsc.astype(scale.dtype), dbi.astype(scale.dtype)


_ln_window_partition.defvjp(_vjp_fwd, _vjp_bwd)


def ln_window_partition(x, scale, bias, window_size: int, eps: float = 1e-6,
                        interpret: bool = False):
    """``window_partition(LayerNorm(x))`` in one fused HBM pass.

    x: (B, H, W, C); scale, bias: (C,) f32 (the flax LayerNorm params).
    Returns the windowed (B·nW, ws, ws, C) tensor in ``x.dtype`` with zero
    pad slots — bit-compatible with
    ``window_partition(nn.LayerNorm(epsilon=eps, dtype=x.dtype)(x))``.
    """
    b, h, w, c = x.shape
    return _ln_window_partition(x, scale, bias, int(window_size), int(h),
                                int(w), float(eps), interpret)
