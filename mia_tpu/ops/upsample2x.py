"""Pallas k=2/s=2 transposed-conv (2x upsample) for thin-channel stages.

**Status: measured NEGATIVE — kept as the record of the experiment**
(docs/PERF.md §21). In-context on the CPC-SAM phase programs the kernel
REGRESSES phase-1 84.5 → 57.7 and phase-2 39.6 → 21.6 img/s: the
per-row-band grid runs thin (W, Cin)×(Cin, Cout) GEMMs (Cin/Cout down to
16) that can't fill the MXU and can't amortize per-cell overhead, while
XLA's einsum lowering batches the whole contraction as ONE large GEMM over
all B·H·W tokens and pays only the interleave copy. ``EinsumConvTranspose2x``
defaults to ``use_pallas="never"``; ``tests/test_ops_conv.py`` pins
exactness via ``"always"``.

The motivating observation stands: the SAM prompt-large mask decoder's
4-stage upscaler runs ``EinsumConvTranspose2x`` stages whose channel counts
shrink to 16 — on TPU the einsum's interleave reshape and its BACKWARD
de-interleave lower to layout copies over (B, 2H, 2W, C) tensors with a
16-lane minor axis (a phase-2 device trace attributes ~60 ms of a 195 ms
CPC-SAM step to these nodes, `bwd output_upscaling/up3` alone 28.5 ms).
This kernel computes the four taps as small MXU GEMMs per grid row-band
and writes the output DIRECTLY in an interleave-free layout:

    out array (B, H, 2, W, 2*C)  ==row-major==  (B, 2H, 2W, C)

so the XLA-level reshape to the interleaved tensor is a free dim merge and
no copy ever materializes, in either direction. The backward kernel reads
the cotangent in the same layout (lane-sliced taps), producing dx in one
pass plus per-band dw/dbias partials summed outside.

Exactness: identical contraction to ``EinsumConvTranspose2x`` (f32
accumulation), pinned by ``tests/test_ops_conv.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def upsample2x_available(h: int, w: int, cin: int, cout: int,
                         interpret: bool) -> bool:
    """Mosaic can always tile this (lane dims are padded); gate only on a
    sane VMEM footprint for the per-band working set."""
    if interpret:
        return True
    th = _pick_th(h)
    # x band f32 + 4 tap outputs + out tile, generous 4-byte estimate
    vmem = th * w * (cin + 6 * cout) * 4
    return vmem < 32 * 2**20


def _pick_th(h: int) -> int:
    for th in (8, 4, 2, 1):
        if h % th == 0:
            return th
    return 1


def _fwd_kernel(x_ref, w_ref, b_ref, o_ref, *, th, cout):
    # x_ref (1, th, W, Cin); w_ref (2, 2, Cin, Cout); o_ref (1, th, 2, W, 2*Cout)
    w00 = w_ref[0, 0]
    w01 = w_ref[0, 1]
    w10 = w_ref[1, 0]
    w11 = w_ref[1, 1]
    bias2 = jnp.concatenate([b_ref[0, 0], b_ref[0, 0]], axis=-1)  # (2*Cout,)
    for r in range(th):
        x = x_ref[0, r]  # (W, Cin)

        def taps(wa, wb):
            ya = jax.lax.dot_general(
                x, wa, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            yb = jax.lax.dot_general(
                x, wb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return jnp.concatenate([ya, yb], axis=-1) + bias2  # (W, 2*Cout)

        o_ref[0, r, 0] = taps(w00, w01).astype(o_ref.dtype)
        o_ref[0, r, 1] = taps(w10, w11).astype(o_ref.dtype)


def _fwd_impl(x, w, b, interpret):
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    th = _pick_th(h)
    grid = (bsz, h // th)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, th=th, cout=cout),
        out_shape=jax.ShapeDtypeStruct((bsz, h, 2, wd, 2 * cout), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, wd, cin), lambda bb, t: (bb, t, 0, 0)),
            pl.BlockSpec((2, 2, cin, cout), lambda bb, t: (0, 0, 0, 0)),
            pl.BlockSpec((1, 1, cout), lambda bb, t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, th, 2, wd, 2 * cout), lambda bb, t: (bb, t, 0, 0, 0)
        ),
        interpret=interpret,
    )(x, w, b.reshape(1, 1, cout))
    return out.reshape(bsz, 2 * h, 2 * wd, cout)


def _bwd_kernel(x_ref, w_ref, dy_ref, dx_ref, dw_ref, db_ref, *, th, cout):
    # dy_ref (1, th, 2, W, 2*Cout) — taps are (row-parity i, lane half j)
    cin = x_ref.shape[-1]
    dw_acc = [[jnp.zeros((cin, cout), jnp.float32) for _ in range(2)] for _ in range(2)]
    db_acc = jnp.zeros((cout,), jnp.float32)
    for r in range(th):
        x = x_ref[0, r]  # (W, Cin)
        dx_r = jnp.zeros((x.shape[0], cin), jnp.float32)
        for i in range(2):
            dy_row = dy_ref[0, r, i].astype(jnp.float32)  # (W, 2*Cout)
            for j in range(2):
                dy_ij = dy_row[:, j * cout : (j + 1) * cout]  # (W, Cout)
                wij = w_ref[i, j]  # (Cin, Cout)
                dx_r = dx_r + jax.lax.dot_general(
                    dy_ij, wij, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dw_acc[i][j] = dw_acc[i][j] + jax.lax.dot_general(
                    x.astype(jnp.float32), dy_ij, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                db_acc = db_acc + jnp.sum(dy_ij, axis=0)
        dx_ref[0, r] = dx_r.astype(dx_ref.dtype)
    for i in range(2):
        for j in range(2):
            dw_ref[0, i, j] = dw_acc[i][j]
    db_ref[0, 0] = db_acc


def _bwd_impl(x, w, dy, interpret):
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    th = _pick_th(h)
    grid = (bsz, h // th)
    ncell = bsz * (h // th)
    dy5 = dy.reshape(bsz, h, 2, wd, 2 * cout)
    dx, dw_p, db_p = pl.pallas_call(
        functools.partial(_bwd_kernel, th=th, cout=cout),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, wd, cin), x.dtype),
            jax.ShapeDtypeStruct((ncell, 2, 2, cin, cout), jnp.float32),
            jax.ShapeDtypeStruct((ncell, 1, cout), jnp.float32),
        ],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, wd, cin), lambda bb, t: (bb, t, 0, 0)),
            pl.BlockSpec((2, 2, cin, cout), lambda bb, t: (0, 0, 0, 0)),
            pl.BlockSpec((1, th, 2, wd, 2 * cout), lambda bb, t: (bb, t, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, th, wd, cin), lambda bb, t: (bb, t, 0, 0)),
            pl.BlockSpec(
                (1, 2, 2, cin, cout),
                lambda bb, t, g=grid: (bb * g[1] + t, 0, 0, 0, 0),
            ),
            pl.BlockSpec((1, 1, cout), lambda bb, t, g=grid: (bb * g[1] + t, 0, 0)),
        ],
        interpret=interpret,
    )(x, w, dy5)
    return dx, dw_p.sum(0), db_p.reshape(ncell, cout).sum(0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv_transpose2x_p(x, w, b, interpret=False):
    """k=2/s=2 ConvTranspose: x (B, H, W, Cin), w (2, 2, Cin, Cout),
    b (Cout,) → (B, 2H, 2W, Cout). Same contraction as
    ``EinsumConvTranspose2x`` with the tap kernel NOT reversed — callers
    pass the reversed kernel themselves to match that module's semantics."""
    return _fwd_impl(x, w, b, interpret)


def _vjp_fwd(x, w, b, interpret):
    return _fwd_impl(x, w, b, interpret), (x, w)


def _vjp_bwd(interpret, res, dy):
    x, w = res
    dx, dw, db = _bwd_impl(x, w, dy, interpret)
    return dx, dw.astype(w.dtype), db.astype(jnp.float32)


conv_transpose2x_p.defvjp(_vjp_fwd, _vjp_bwd)
