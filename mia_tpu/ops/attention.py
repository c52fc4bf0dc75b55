"""Fused multi-head attention Pallas kernel for the SAM ViT.

The encoder's attention (windowed 196-token and global ≤4096-token
sequences, ``image_encoder.py``) is the CPC-SAM FLOPs hot spot. XLA
materializes the (B·heads, N, N) score tensor in HBM between the two
matmuls; these kernels keep a q-block's scores in VMEM, fusing
``scores → (+rel-pos bias) → softmax → @v`` into one pass per grid cell.

Three tiers, hottest first:

- ``fused_attention_rel_packed`` (the ViT hot path): q/k/v are read
  straight out of the qkv Dense output layout (B, N, 3·H·D) via
  lane-sliced BlockSpecs and the context lands in the proj layout — no
  head-major transposes touch HBM. The factored rel-pos bias folds into
  the score matmul by K-axis concatenation (contraction depth D+k_h+k_w),
  blocks need not divide the token axis (OOB reads masked in-kernel,
  OOB writes dropped), and each grid cell processes a group of heads.
  Backward is a flash-style Pallas kernel: scores recomputed per q-block,
  gradient matmuls in the input dtype, dq/drel folded into one matmul
  against k_aug and dk into one against q_aug, fp32 dk/dv reduction
  across q-blocks.
- ``fused_attention_rel``: same math on pre-transposed head-major
  (BH, N, D) operands (kept for API compatibility and as a simpler
  reference of the layout tricks).
- ``fused_attention``: dense additive-bias variant (off the hot path),
  einsum backward.

On non-TPU backends the kernels run in Pallas interpret mode (tests), so
one code path serves everywhere.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    # Dots run in the INPUT dtype (bf16 on the fast MXU path) with fp32
    # accumulation; softmax statistics stay fp32.
    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (N, D)
    v = v_ref[0]  # (N, D)
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BQ, N)
    s = s + bias_ref[0].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / denom).astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _fused_attention_fwd_impl(q, k, v, bias, scale: float, block_q: int, interpret: bool):
    bh, n, d = q.shape
    grid = (bh, n // block_q)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, n), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(q, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_attention(q, k, v, bias, scale: float, block_q: int = 128, interpret: bool = False):
    """softmax(q·kᵀ·scale + bias)·v, fused per q-block.

    q, k, v: (BH, N, D); bias: (BH, N, N) additive (use −inf to mask padded
    keys). N must be a multiple of ``block_q``.
    """
    return _fused_attention_fwd_impl(q, k, v, bias, scale, block_q, interpret)


def _fwd(q, k, v, bias, scale, block_q, interpret):
    out = _fused_attention_fwd_impl(q, k, v, bias, scale, block_q, interpret)
    return out, (q, k, v, bias)


def _bwd(scale, block_q, interpret, residuals, g):
    q, k, v, bias = residuals
    q32, k32, v32, g32 = (x.astype(jnp.float32) for x in (q, k, v, g))
    s = jnp.einsum("bqd,bkd->bqk", q32 * scale, k32) + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bqk,bqd->bkd", p, g32)
    dp = jnp.einsum("bqd,bkd->bqk", g32, v32)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq = jnp.einsum("bqk,bkd->bqd", ds, k32) * scale
    dk = jnp.einsum("bqk,bqd->bkd", ds, q32) * scale
    dbias = ds
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dbias.astype(bias.dtype)


fused_attention.defvjp(_fwd, _bwd)


def pad_for_attention(n: int, block_q: int = 128) -> int:
    return ((n + block_q - 1) // block_q) * block_q


def attention_with_padding(q, k, v, bias, scale: float, block_q: int = 128):
    """Pad N up to the block size (−inf bias on padded keys), run the fused
    kernel, slice back. Interpret mode is selected automatically off-TPU."""
    bh, n, d = q.shape
    np_ = pad_for_attention(n, block_q)
    interpret = jax.default_backend() != "tpu"
    if np_ != n:
        pad = np_ - n
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, pad), (0, pad)), constant_values=_NEG_INF)
    out = fused_attention(q, k, v, bias, scale, block_q, interpret)
    return out[:, :n]


# ---------------------------------------------------------------------------
# decomposed rel-pos variant: bias = rel_h[..., None] + rel_w[..., None, :]
# stays factored — the (BH, N, N) bias tensor never exists in HBM.
# ---------------------------------------------------------------------------


def _onehot_expanders_t(k_h: int, k_w: int, n_pad: int, n_real: int, dtype):
    """(n_pad, k_h) / (n_pad, k_w) one-hot matrices (key-major) that expand
    the factored rel-pos bias — ``bias[q, j] = rel_h[q, j // k_w] +
    rel_w[q, j % k_w]``. They are CONCATENATED onto k inside the kernel so
    the score matmul carries the bias in the same MXU pass:
    ``s = [q·scale | rel_h | rel_w] @ [k | E_hᵀ | E_wᵀ]ᵀ`` with contraction
    depth D + k_h + k_w (92 → one 128-deep pass for 14×14 windows, exactly
    128 for 32×32 global layers) instead of three separate small matmuls.
    Entries are 0/1, so bf16 is exact; rows ≥ n_real (key padding) are
    zero."""
    row_h = jax.lax.broadcasted_iota(jnp.int32, (n_pad, k_h), 0)
    col_h = jax.lax.broadcasted_iota(jnp.int32, (n_pad, k_h), 1)
    e_h_t = ((row_h // k_w == col_h) & (row_h < n_real)).astype(dtype)
    row_w = jax.lax.broadcasted_iota(jnp.int32, (n_pad, k_w), 0)
    col_w = jax.lax.broadcasted_iota(jnp.int32, (n_pad, k_w), 1)
    e_w_t = ((row_w % k_w == col_w) & (row_w < n_real)).astype(dtype)
    return e_h_t, e_w_t


def _attn_rel_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *,
                     scale: float, k_h: int, k_w: int, n_real: int):
    """Score matmul with the factored rel-pos bias folded into the SAME MXU
    pass via K-axis concatenation (see ``_onehot_expanders_t``). Dots run in
    the INPUT dtype (bf16 fast path, fp32 accumulation); softmax statistics
    stay fp32.

    Each grid cell processes a GROUP of ``G`` (batch·head) rows via an
    unrolled loop — per-cell work at SAM window sizes (N_pad = 256,
    D = 64) is ~10 MFLOP, far too small to amortize per-cell overheads
    at G = 1."""
    g_size = q_ref.shape[0]
    n_pad = k_ref.shape[1]
    e_h_t, e_w_t = _onehot_expanders_t(k_h, k_w, n_pad, n_real, q_ref.dtype)
    scale_lo = jnp.asarray(scale, q_ref.dtype)
    padded = n_pad > n_real
    if padded:
        # inputs are UNPADDED in HBM — rows past n_real of this block are
        # out-of-bounds garbage (possibly NaN/Inf), so every operand that
        # feeds a matmul contraction must be zero-masked (0·NaN = NaN).
        kmask = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0) < n_real
    for g in range(g_size):
        v = v_ref[g]
        q_aug = jnp.concatenate(
            [q_ref[g] * scale_lo, rh_ref[g], rw_ref[g]], axis=1
        )  # (BQ, D + k_h + k_w)
        k_aug = jnp.concatenate([k_ref[g], e_h_t, e_w_t], axis=1)
        bq = q_aug.shape[0]
        s = jax.lax.dot_general(
            q_aug, k_aug,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, N_pad)
        if padded:
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, n_pad), 1)
            s = jnp.where(col < n_real, s, _NEG_INF)
            v = jnp.where(kmask, v, 0)

        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            (p / denom).astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[g] = o.astype(o_ref.dtype)


def _pick_block_q(n_pad: int, n_real: int | None = None) -> int:
    """Largest power-of-two block ≤ 256 dividing n_pad (n_pad is always a
    multiple of 128 after padding). 256 measured best at the 1024-token
    global layers (4 blocks × group). For short sequences (one-block
    windows), round the REAL token count up to the sublane tile (16 rows
    covers bf16 and f32) instead of the 128-lane pad: 196-token windows
    then run 208-row dots, not 256 — every q-dim and k-dim in the kernel
    shrinks ~19%."""
    if n_real is not None and n_real <= 256:
        # floor 64: _packed_layout rejects blocks below its VMEM-tiling
        # minimum, and tiny test windows (n_real ≤ 64) must keep a legal
        # candidate
        return max(64, -(-n_real // 16) * 16)
    bq = 256
    while n_pad % bq:
        bq //= 2
    return bq


def _pick_group(bh: int, n_pad: int, block_q: int, d: int, ka: int,
                itemsize: int, bwd: bool,
                budget_bytes: int = 12 * 2**20) -> int:
    """Largest divisor of bh ≤ 16 whose per-cell VMEM footprint fits the
    budget (16 MB VMEM total; leave headroom for Mosaic's own buffers).

    Accounts: double-buffered operand/output blocks at the input itemsize,
    the live fp32 score-sized buffers (2 fwd: s, p; 4 bwd: s, p, dp, ds),
    the in-kernel q_aug/k_aug concat copies, and (bwd) the fp32 dk/dv
    accumulators."""
    score_f32 = (3 if bwd else 2) * block_q * n_pad * 4
    n_q_streams = 3 if bwd else 1  # q[,o,g]
    ins = 2 * itemsize * (
        n_q_streams * block_q * d + 2 * n_pad * d + block_q * ka
    )
    concats = itemsize * (block_q + n_pad) * (d + ka)
    if bwd:
        # dk/dv fp32 accumulators revisit the same block (no double buffer)
        outs = 2 * block_q * (d + ka) * itemsize + 2 * n_pad * d * 4
    else:
        outs = 2 * block_q * d * itemsize
    per_g = score_f32 + ins + concats + outs
    g_cap = max(1, budget_bytes // max(per_g, 1))
    for cand in range(min(g_cap, 16), 0, -1):
        if bh % cand == 0:
            return cand
    return 1


def _fused_rel_fwd_impl(q, k, v, rel_h, rel_w, scale, k_hw, block_q, interpret):
    bh, n, d = q.shape
    k_h, k_w = k_hw
    if n != k_h * k_w:
        raise ValueError(f"token count {n} != k_h*k_w {k_h * k_w}")
    n_real = n
    if block_q is None:
        block_q = _pick_block_q(pad_for_attention(n, 128), n)
    # blocks need not divide the token axis: out-of-bounds reads are
    # garbage (masked in-kernel), out-of-bounds writes are dropped — no
    # HBM pad/slice round trips.
    n_blocks = pl.cdiv(n, block_q)
    n_kblk = n_blocks * block_q
    block_g = _pick_group(bh, n_kblk, block_q, d, k_h + k_w,
                          jnp.dtype(q.dtype).itemsize, bwd=False)
    grid = (bh // block_g, n_blocks)
    return pl.pallas_call(
        functools.partial(
            _attn_rel_kernel, scale=scale, k_h=k_h, k_w=k_w, n_real=n_real
        ),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_g, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((block_g, n_kblk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((block_g, n_kblk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((block_g, block_q, k_h), lambda b, i: (b, i, 0)),
            pl.BlockSpec((block_g, block_q, k_w), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((block_g, block_q, d), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(q, k, v, rel_h, rel_w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_attention_rel(q, k, v, rel_h, rel_w, scale, k_hw, block_q=None,
                        interpret=False):
    """softmax(q·kᵀ·scale + rel_h⊕rel_w)·v with the decomposed rel-pos bias
    applied IN-KERNEL (``rel_h`` (BH, N, k_h), ``rel_w`` (BH, N, k_w));
    N must equal ``k_hw[0]*k_hw[1]`` and need NOT be block-aligned."""
    return _fused_rel_fwd_impl(q, k, v, rel_h, rel_w, scale, k_hw, block_q, interpret)


def _rel_fwd(q, k, v, rel_h, rel_w, scale, k_hw, block_q, interpret):
    out = _fused_rel_fwd_impl(q, k, v, rel_h, rel_w, scale, k_hw, block_q, interpret)
    return out, (q, k, v, rel_h, rel_w, out)


def _rel_bwd_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, g_ref,
                    dq_ref, dk_ref, dv_ref, drh_ref, drw_ref, *,
                    scale: float, k_h: int, k_w: int, n_real: int):
    """Flash-style backward per (batch·head, q-block) grid cell.

    The full key set fits in VMEM at SAM sizes (N_pad ≤ 1024, D = 64), so
    instead of saving logsumexp the kernel recomputes scores→softmax for its
    q-block, then runs the five gradient matmuls in the input dtype (bf16
    MXU path, fp32 accumulation). dk/dv are accumulated across q-blocks by
    revisiting the same fp32 output block (the grid's inner axis acts as a
    sequential reduction on TPU). Padded keys contribute p = 0 so no extra
    masking is needed; padded-query rows receive zero cotangents from the
    caller's output slice.

    Like the forward, each grid cell handles a group of ``G`` (batch·head)
    rows via an unrolled loop to amortize per-cell overhead.
    """
    g_size = q_ref.shape[0]
    n_pad = k_ref.shape[1]
    d = k_ref.shape[2]
    e_h_t, e_w_t = _onehot_expanders_t(k_h, k_w, n_pad, n_real, q_ref.dtype)
    scale_lo = jnp.asarray(scale, q_ref.dtype)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    padded = n_pad > n_real
    if padded:
        # Inputs are UNPADDED in HBM: block rows past n_real are garbage
        # (possibly NaN/Inf). Anything feeding a matmul contraction must be
        # zero-masked — 0·NaN = NaN would otherwise poison whole outputs.
        kmask = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0) < n_real
        bq0 = q_ref.shape[1]
        qrow = (
            jax.lax.broadcasted_iota(jnp.int32, (bq0, 1), 0)
            + pl.program_id(1) * bq0
        )
        qmask = qrow < n_real

    for gi in range(g_size):
        v = v_ref[gi]
        g = g_ref[gi]  # (BQ, D)
        o = o_ref[gi]
        # K-concatenated operands: the score recompute AND the dq/drel/dk
        # matmuls each collapse into a single wider MXU pass.
        q_aug = jnp.concatenate(
            [q_ref[gi] * scale_lo, rh_ref[gi], rw_ref[gi]], axis=1
        )  # (BQ, Ka)
        k_aug = jnp.concatenate([k_ref[gi], e_h_t, e_w_t], axis=1)  # (N_pad, Ka)
        if padded:
            v = jnp.where(kmask, v, 0)
            g = jnp.where(qmask, g, 0)
            q_aug = jnp.where(qmask, q_aug, 0)
            k_aug = jnp.where(kmask, k_aug, 0)
        bq = q_aug.shape[0]

        s = jax.lax.dot_general(
            q_aug, k_aug, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, N_pad)
        if padded:
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, n_pad), 1)
            s = jnp.where(col < n_real, s, _NEG_INF)

        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)  # fp32 (BQ, N_pad)
        if padded:
            p = jnp.where(qmask, p, 0.0)  # garbage q rows: m/denom are NaN

        delta = jnp.sum(
            g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
        )  # (BQ, 1)
        if padded:
            delta = jnp.where(qmask, delta, 0.0)  # o rows are garbage too

        p_lo = p.astype(v.dtype)
        dv_c = jax.lax.dot_general(  # pᵀ·g → (N_pad, D)
            p_lo, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(  # g·vᵀ → (BQ, N_pad)
            g, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        ds_lo = ds.astype(q_aug.dtype)
        # ds·k_aug → [ds·k | ds·E_h | ds·E_w] = [dq/scale | drel_h | drel_w]
        dq_aug = jax.lax.dot_general(
            ds_lo, k_aug, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, Ka)
        # dsᵀ·q_aug → first D columns are dsᵀ·(q·scale) = dk (E parts are
        # constants whose cotangent is discarded)
        dk_aug = jax.lax.dot_general(
            ds_lo, q_aug, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N_pad, Ka)

        dq_ref[gi] = (dq_aug[:, :d] * scale).astype(dq_ref.dtype)
        drh_ref[gi] = dq_aug[:, d:d + k_h].astype(drh_ref.dtype)
        drw_ref[gi] = dq_aug[:, d + k_h:].astype(drw_ref.dtype)
        dk_ref[gi] += dk_aug[:, :d]
        dv_ref[gi] += dv_c


def _rel_bwd(scale, k_hw, block_q, interpret, residuals, g):
    q, k, v, rel_h, rel_w, out = residuals
    k_h, k_w = k_hw
    n_real = k_h * k_w
    bh, n, d = q.shape
    if block_q is None:
        block_q = _pick_block_q(pad_for_attention(n, 128), n)
    n_blocks = pl.cdiv(n, block_q)
    n_kblk = n_blocks * block_q
    block_g = _pick_group(bh, n_kblk, block_q, d, k_h + k_w,
                          jnp.dtype(q.dtype).itemsize, bwd=True)
    grid = (bh // block_g, n_blocks)
    dq, dk, dv, drh, drw = pl.pallas_call(
        functools.partial(
            _rel_bwd_kernel, scale=scale, k_h=k_h, k_w=k_w, n_real=n_real
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, n, k_h), rel_h.dtype),
            jax.ShapeDtypeStruct((bh, n, k_w), rel_w.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_g, block_q, d), lambda b, i: (b, i, 0)),    # q
            pl.BlockSpec((block_g, n_kblk, d), lambda b, i: (b, 0, 0)),     # k
            pl.BlockSpec((block_g, n_kblk, d), lambda b, i: (b, 0, 0)),     # v
            pl.BlockSpec((block_g, block_q, k_h), lambda b, i: (b, i, 0)),  # rel_h
            pl.BlockSpec((block_g, block_q, k_w), lambda b, i: (b, i, 0)),  # rel_w
            pl.BlockSpec((block_g, block_q, d), lambda b, i: (b, i, 0)),    # out
            pl.BlockSpec((block_g, block_q, d), lambda b, i: (b, i, 0)),    # g
        ],
        out_specs=(
            pl.BlockSpec((block_g, block_q, d), lambda b, i: (b, i, 0)),    # dq
            pl.BlockSpec((block_g, n_kblk, d), lambda b, i: (b, 0, 0)),     # dk (accum)
            pl.BlockSpec((block_g, n_kblk, d), lambda b, i: (b, 0, 0)),     # dv (accum)
            pl.BlockSpec((block_g, block_q, k_h), lambda b, i: (b, i, 0)),
            pl.BlockSpec((block_g, block_q, k_w), lambda b, i: (b, i, 0)),
        ),
        interpret=interpret,
    )(q, k, v, rel_h, rel_w, out, g)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), drh, drw


fused_attention_rel.defvjp(_rel_fwd, _rel_bwd)


def attention_rel_with_padding(q, k, v, rel_h, rel_w, scale, k_hw, block_q=None):
    """Run the decomposed-bias fused kernel directly on the UNPADDED token
    axis — out-of-bounds block rows are masked in-kernel and out-of-bounds
    writes dropped, so no HBM pad/slice round trips happen. ``block_q=None``
    auto-selects the block size. (The name is kept for API stability from
    when this wrapper padded in HBM.)"""
    interpret = jax.default_backend() != "tpu"
    return fused_attention_rel(q, k, v, rel_h, rel_w, scale, k_hw, block_q, interpret)


# ---------------------------------------------------------------------------
# packed-layout variant: q/k/v are read straight out of the qkv Dense output
# (B, N, 3·H·D) via lane-sliced BlockSpecs (the same buffer is passed three
# times with different index maps), and the context is written as
# (B, N, H·D) — the proj Dense's input layout. This removes the four
# head-major transpose copies per attention layer that dominated the
# XLA-side profile (9.6 ms fwd / 19.4 ms bwd of `copy` at ViT-B/512 b8).
# ---------------------------------------------------------------------------


def _attn_rel_packed_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *,
                            scale: float, k_h: int, k_w: int, n_real: int,
                            d: int):
    """Like ``_attn_rel_kernel`` but q/k/v blocks carry G heads on the LANE
    axis ((BQ, G·D) / (N_kblk, G·D)); rel blocks stay head-major (G, BQ, k)."""
    gd = q_ref.shape[2]
    g_size = gd // d
    n_pad = k_ref.shape[1]
    e_h_t, e_w_t = _onehot_expanders_t(k_h, k_w, n_pad, n_real, q_ref.dtype)
    scale_lo = jnp.asarray(scale, q_ref.dtype)
    padded = n_pad > n_real
    if padded:
        kmask = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0) < n_real
    for gi in range(g_size):
        sl = slice(gi * d, (gi + 1) * d)
        v = v_ref[0, :, sl]
        q_aug = jnp.concatenate(
            [q_ref[0, :, sl] * scale_lo, rh_ref[gi], rw_ref[gi]], axis=1
        )
        k_aug = jnp.concatenate([k_ref[0, :, sl], e_h_t, e_w_t], axis=1)
        bq = q_aug.shape[0]
        s = jax.lax.dot_general(
            q_aug, k_aug, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if padded:
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, n_pad), 1)
            s = jnp.where(col < n_real, s, _NEG_INF)
            v = jnp.where(kmask, v, 0)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            (p / denom).astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def _packed_layout(b, n, num_heads, d, block_q, bwd, interpret=False,
                   itemsize=2, ka=0):
    """Shared grid/spec builder for the packed kernels."""
    # joint (block_q, group) selection: the lane axis of q/k/v blocks is
    # G·D, which Mosaic requires to be a multiple of 128, and the VMEM
    # footprint must fit; prefer the largest block_q, then the largest G.
    choice = None
    for bq_cand in (block_q, block_q // 2, block_q // 4):
        bq_cand = -(-bq_cand // 16) * 16  # keep sublane-tile multiples
        if bq_cand < 64:
            continue
        cap = _pick_group(num_heads, pl.cdiv(n, bq_cand) * bq_cand,
                          bq_cand, d, ka, itemsize, bwd=bwd)
        for g_cand in range(min(cap, num_heads), 0, -1):
            if num_heads % g_cand == 0 and (
                interpret or (g_cand * d) % 128 == 0
            ):
                choice = (bq_cand, g_cand)
                break
        if choice:
            break
    if choice is None:
        raise ValueError(
            f"no packed-layout tiling for heads={num_heads}, d={d} "
            "(need a head group G with G*D % 128 == 0 fitting VMEM)"
        )
    block_q, block_g = choice
    n_blocks = pl.cdiv(n, block_q)
    n_kblk = n_blocks * block_q
    grid = (b, num_heads // block_g, n_blocks)
    gd = block_g * d
    q_spec = pl.BlockSpec((1, block_q, gd), lambda b, g, i: (b, i, g))
    k_spec = pl.BlockSpec(
        (1, n_kblk, gd),
        lambda b, g, i, _h=num_heads // block_g: (b, 0, _h + g),
    )
    v_spec = pl.BlockSpec(
        (1, n_kblk, gd),
        lambda b, g, i, _h=num_heads // block_g: (b, 0, 2 * _h + g),
    )
    def rh_spec(kdim):
        # head-major (B·H, N, kdim); dim-0 block of G heads for batch b,
        # head-group g sits at block index b·(H/G) + g
        return pl.BlockSpec(
            (block_g, block_q, kdim),
            lambda b, g, i, _h=num_heads // block_g: (b * _h + g, i, 0),
        )

    return grid, block_q, block_g, n_kblk, q_spec, k_spec, v_spec, rh_spec


def _fused_rel_packed_fwd_impl(qkv, rel_h, rel_w, scale, k_hw, num_heads,
                               block_q, interpret):
    b, n, three_hd = qkv.shape
    k_h, k_w = k_hw
    if n != k_h * k_w:
        raise ValueError(f"token count {n} != k_h*k_w {k_h * k_w}")
    d = three_hd // (3 * num_heads)
    if block_q is None:
        block_q = _pick_block_q(pad_for_attention(n, 128), n)
    grid, block_q, block_g, n_kblk, q_spec, k_spec, v_spec, rh_spec = _packed_layout(
        b, n, num_heads, d, block_q, bwd=False, interpret=interpret,
        itemsize=jnp.dtype(qkv.dtype).itemsize, ka=k_h + k_w,
    )
    return pl.pallas_call(
        functools.partial(
            _attn_rel_packed_kernel,
            scale=scale, k_h=k_h, k_w=k_w, n_real=n, d=d,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, num_heads * d), qkv.dtype),
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec, rh_spec(k_h), rh_spec(k_w)],
        out_specs=pl.BlockSpec(
            (1, block_q, block_g * d), lambda b, g, i: (b, i, g)
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, rel_h, rel_w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_attention_rel_packed(qkv, rel_h, rel_w, scale, k_hw, num_heads,
                               block_q=None, interpret=False):
    """softmax(q·kᵀ·scale + rel_h⊕rel_w)·v reading q/k/v from the packed
    ``qkv`` Dense output (B, N, 3·H·D) without any transpose; rel terms are
    head-major (B·H, N, k). Returns the context in (B, N, H·D)."""
    return _fused_rel_packed_fwd_impl(
        qkv, rel_h, rel_w, scale, k_hw, num_heads, block_q, interpret
    )


def _rel_packed_fwd(qkv, rel_h, rel_w, scale, k_hw, num_heads, block_q, interpret):
    out = _fused_rel_packed_fwd_impl(
        qkv, rel_h, rel_w, scale, k_hw, num_heads, block_q, interpret
    )
    return out, (qkv, rel_h, rel_w, out)


def _rel_packed_bwd_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, g_ref,
                           dq_ref, dk_ref, dv_ref, drh_ref, drw_ref, *,
                           scale: float, k_h: int, k_w: int, n_real: int,
                           d: int, accum: bool = True):
    gd = q_ref.shape[2]
    g_size = gd // d
    n_pad = k_ref.shape[1]
    e_h_t, e_w_t = _onehot_expanders_t(k_h, k_w, n_pad, n_real, q_ref.dtype)
    scale_lo = jnp.asarray(scale, q_ref.dtype)
    padded = n_pad > n_real
    if padded:
        kmask = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0) < n_real
        bq0 = q_ref.shape[1]
        qrow = (
            jax.lax.broadcasted_iota(jnp.int32, (bq0, 1), 0)
            + pl.program_id(2) * bq0
        )
        qmask = qrow < n_real

    if accum:
        @pl.when(pl.program_id(2) == 0)
        def _():
            dk_ref[...] = jnp.zeros_like(dk_ref)
            dv_ref[...] = jnp.zeros_like(dv_ref)

    for gi in range(g_size):
        sl = slice(gi * d, (gi + 1) * d)
        v = v_ref[0, :, sl]
        g = g_ref[0, :, sl]
        o = o_ref[0, :, sl]
        q_aug = jnp.concatenate(
            [q_ref[0, :, sl] * scale_lo, rh_ref[gi], rw_ref[gi]], axis=1
        )
        k_aug = jnp.concatenate([k_ref[0, :, sl], e_h_t, e_w_t], axis=1)
        if padded:
            v = jnp.where(kmask, v, 0)
            g = jnp.where(qmask, g, 0)
            q_aug = jnp.where(qmask, q_aug, 0)
            k_aug = jnp.where(kmask, k_aug, 0)
        bq = q_aug.shape[0]

        s = jax.lax.dot_general(
            q_aug, k_aug, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if padded:
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, n_pad), 1)
            s = jnp.where(col < n_real, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if padded:
            p = jnp.where(qmask, p, 0.0)

        delta = jnp.sum(
            g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
        )
        if padded:
            delta = jnp.where(qmask, delta, 0.0)

        p_lo = p.astype(v.dtype)
        dv_c = jax.lax.dot_general(
            p_lo, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            g, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        ds_lo = ds.astype(q_aug.dtype)
        dq_aug = jax.lax.dot_general(
            ds_lo, k_aug, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_aug = jax.lax.dot_general(
            ds_lo, q_aug, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, :, sl] = (dq_aug[:, :d] * scale).astype(dq_ref.dtype)
        drh_ref[gi] = dq_aug[:, d:d + k_h].astype(drh_ref.dtype)
        drw_ref[gi] = dq_aug[:, d + k_h:].astype(drw_ref.dtype)
        if accum:
            dk_ref[0, :, sl] += dk_aug[:, :d]
            dv_ref[0, :, sl] += dv_c
        else:  # single q-block: no zero-init/read-modify-write round trip
            dk_ref[0, :, sl] = dk_aug[:, :d]
            dv_ref[0, :, sl] = dv_c


def _rel_packed_bwd(scale, k_hw, num_heads, block_q, interpret, residuals, g):
    qkv, rel_h, rel_w, out = residuals
    b, n, three_hd = qkv.shape
    k_h, k_w = k_hw
    d = three_hd // (3 * num_heads)
    hd = num_heads * d
    if block_q is None:
        block_q = _pick_block_q(pad_for_attention(n, 128), n)
    grid, block_q, block_g, n_kblk, q_spec, k_spec, v_spec, rh_spec = _packed_layout(
        b, n, num_heads, d, block_q, bwd=True, interpret=interpret,
        itemsize=jnp.dtype(qkv.dtype).itemsize, ka=k_h + k_w,
    )
    oi_spec = pl.BlockSpec((1, block_q, block_g * d), lambda b, g, i: (b, i, g))
    acc_spec = pl.BlockSpec((1, n_kblk, block_g * d), lambda b, g, i: (b, 0, g))
    dq, dk, dv, drh, drw = pl.pallas_call(
        functools.partial(
            _rel_packed_bwd_kernel,
            scale=scale, k_h=k_h, k_w=k_w, n_real=n, d=d,
            accum=grid[2] > 1,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, hd), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, n, hd), jnp.float32),
            jax.ShapeDtypeStruct((b * num_heads, n, k_h), rel_h.dtype),
            jax.ShapeDtypeStruct((b * num_heads, n, k_w), rel_w.dtype),
        ),
        grid=grid,
        in_specs=[
            q_spec, k_spec, v_spec, rh_spec(k_h), rh_spec(k_w),
            oi_spec, oi_spec,
        ],
        out_specs=(oi_spec, acc_spec, acc_spec, rh_spec(k_h), rh_spec(k_w)),
        interpret=interpret,
    )(qkv, qkv, qkv, rel_h, rel_w, out, g)
    dqkv = jnp.concatenate(
        [dq, dk.astype(qkv.dtype), dv.astype(qkv.dtype)], axis=-1
    )
    return dqkv, drh, drw


fused_attention_rel_packed.defvjp(_rel_packed_fwd, _rel_packed_bwd)


# ---------------------------------------------------------------------------
# in-kernel-rel packed variant: the decomposed rel-pos TERMS are computed
# INSIDE the kernel instead of arriving as head-major (B·H, N, k) inputs.
# Why: producing that layout from token-major q costs XLA a 5D einsum whose
# operand/result transposes dominate the encoder's residual data-formatting
# time (~5 ms of 0.16 ms copies per ViT-B/512 b8 fwd+bwd — the
# `byxhc,ykc->bhyxk` transpose family), and the backward pays drel HBM
# round trips plus the transposed VJP einsums on top. In-kernel, the terms
# come from a CANDIDATE matmul against the (q_h·k_h, d) gathered rel table
# (shared across heads): full = q @ rel_flatᵀ gives every (row, k) value,
# and a static masked-slice select picks row y_n's slice per token —
# rel_h[n, k] = full[n, y_n·k_h + k]. The select is Σ_y (y_n==y)·slice_y:
# static lane slices + VPU masked adds (the pattern the kernels already use
# for `dq_aug[:, d:d+k_h]`). The backward scatters drel back through the
# same one-hots and accumulates the (q_h·k_h, d) table gradient across the
# whole grid in a VMEM-resident f32 block (constant index map), so the only
# rel tensors in HBM are the two tiny tables. The candidate matmul costs
# q_h× the flops of the out-of-kernel einsum — trivial for 14×14 windows
# (the intended use), ruinous for 32² global layers (which keep the
# einsum path).
# ---------------------------------------------------------------------------


def _hw_collapse(q_h: int, k_h: int, q_w: int, k_w: int, dtype):
    """(q_h·k_h + q_w·k_w, k_h + k_w) block-stacked identity collapsing the
    CONCATENATED h|w candidate axis to [rel_h | rel_w] columns:
    C[(y,j), j] = 1 for the h rows, C[nh + (x,j), k_h + j] = 1 for w."""
    nh = q_h * k_h
    rows = nh + q_w * k_w
    cols = k_h + k_w
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    h_part = (r < nh) & (c < k_h) & (r % k_h == c)
    w_part = (r >= nh) & (c >= k_h) & ((r - nh) % k_w == c - k_h)
    return (h_part | w_part).astype(dtype)


def _hw_piece_mask(bq: int, q_h: int, k_h: int, q_w: int, k_w: int, y_idx,
                   x_idx):
    """(bq, q_h·k_h + q_w·k_w) mask: h-candidate column belongs to piece
    y_idx[n], w-candidate column to x_idx[n] (iota compares — no lane
    slices, which Mosaic lowers ruinously at 14-col offsets)."""
    nh = q_h * k_h
    m = jax.lax.broadcasted_iota(jnp.int32, (bq, nh + q_w * k_w), 1)
    in_h = m < nh
    return (in_h & (m // k_h == y_idx)) | (
        ~in_h & ((m - nh) // k_w == x_idx)
    )


def _rel_select_hw(q, thw_t, collapse, mask, out_dtype):
    """[rel_h | rel_w](bq, k_h+k_w) from one candidate matmul against the
    CONCATENATED [rh_flat; rw_flat] table + mask + ONE collapse matmul;
    exactly one nonzero per output element, so the bf16 cast commutes with
    the sum."""
    full = jax.lax.dot_general(
        q, thw_t, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    masked = jnp.where(mask, full, 0.0).astype(out_dtype)
    return jax.lax.dot_general(
        masked, collapse, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def _rel_scatter_hw(drel_hw, collapse, mask):
    """dfull[(bq, cand)] = spread(drel)·mask — inverse of
    ``_rel_select_hw`` (broadcast matmul + mask, no slices/concats)."""
    spread = jax.lax.dot_general(
        drel_hw, collapse, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(drel_hw.dtype)
    return jnp.where(mask, spread, 0)


def _attn_rel_packed_ik_kernel(q_ref, k_ref, v_ref, thw_ref, o_ref,
                               rel_ref=None, *, scale: float, k_h: int,
                               k_w: int, n_real: int, d: int):
    gd = q_ref.shape[2]
    g_size = gd // d
    n_pad = k_ref.shape[1]
    q_h = n_real // k_w
    e_h_t, e_w_t = _onehot_expanders_t(k_h, k_w, n_pad, n_real, q_ref.dtype)
    scale_lo = jnp.asarray(scale, q_ref.dtype)
    padded = n_pad > n_real
    bq = q_ref.shape[1]
    row = (
        jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
        + pl.program_id(2) * bq
    )
    y_idx = row // k_w
    x_idx = row % k_w
    thw_t = thw_ref[...]  # (q_h·k_h + q_w·k_w, d) — [rh_flat; rw_flat]
    collapse = _hw_collapse(q_h, k_h, k_w, k_w, q_ref.dtype)
    hw_mask = _hw_piece_mask(bq, q_h, k_h, k_w, k_w, y_idx, x_idx)
    if padded:
        kmask = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0) < n_real
    for gi in range(g_size):
        sl = slice(gi * d, (gi + 1) * d)
        q = q_ref[0, :, sl]
        v = v_ref[0, :, sl]
        rel_hw = _rel_select_hw(q, thw_t, collapse, hw_mask, q.dtype)
        if rel_ref is not None:
            # residual for the backward: the (bq, k_h+k_w) selected rel
            # terms, zero-padded to the d-lane head slot so the store is
            # the same 64-aligned slice pattern as o_ref
            rel_ref[0, :, sl] = jnp.concatenate(
                [rel_hw,
                 jnp.zeros((bq, d - (k_h + k_w)), rel_ref.dtype)], axis=1
            ).astype(rel_ref.dtype)
        q_aug = jnp.concatenate([q * scale_lo, rel_hw], axis=1)
        k_aug = jnp.concatenate([k_ref[0, :, sl], e_h_t, e_w_t], axis=1)
        s = jax.lax.dot_general(
            q_aug, k_aug, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if padded:
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, n_pad), 1)
            s = jnp.where(col < n_real, s, _NEG_INF)
            v = jnp.where(kmask, v, 0)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            (p / denom).astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def _fused_rel_packed_ik_fwd_impl(qkv, rh_flat, rw_flat, scale, k_hw,
                                  num_heads, block_q, interpret,
                                  save_rel=False):
    b, n, three_hd = qkv.shape
    k_h, k_w = k_hw
    if n != k_h * k_w:
        raise ValueError(f"token count {n} != k_h*k_w {k_h * k_w}")
    d = three_hd // (3 * num_heads)
    if save_rel and k_h + k_w > d:
        save_rel = False  # rel terms don't fit the d-lane head slot
    if block_q is None:
        block_q = _pick_block_q(pad_for_attention(n, 128), n)
    grid, block_q, block_g, n_kblk, q_spec, k_spec, v_spec, _ = _packed_layout(
        b, n, num_heads, d, block_q, bwd=False, interpret=interpret,
        itemsize=jnp.dtype(qkv.dtype).itemsize, ka=k_h + k_w,
    )
    thw = jnp.concatenate([rh_flat, rw_flat], axis=0)
    tab_spec = pl.BlockSpec(thw.shape, lambda b, g, i: (0, 0))
    o_spec = pl.BlockSpec((1, block_q, block_g * d), lambda b, g, i: (b, i, g))
    o_shape = jax.ShapeDtypeStruct((b, n, num_heads * d), qkv.dtype)
    out = pl.pallas_call(
        functools.partial(
            _attn_rel_packed_ik_kernel,
            scale=scale, k_h=k_h, k_w=k_w, n_real=n, d=d,
        ),
        out_shape=(o_shape, o_shape) if save_rel else o_shape,
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec, tab_spec],
        out_specs=(o_spec, o_spec) if save_rel else o_spec,
        interpret=interpret,
    )(qkv, qkv, qkv, thw)
    return out if save_rel else (out, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_attention_rel_packed_ik(qkv, rh_flat, rw_flat, scale, k_hw,
                                  num_heads, block_q=None, interpret=False):
    """``fused_attention_rel_packed`` with IN-KERNEL rel terms: takes the
    (q_h·k_h, d)/(q_w·k_w, d) gathered rel tables (shared across heads)
    instead of precomputed per-token terms. Returns (B, N, H·D)."""
    out, _ = _fused_rel_packed_ik_fwd_impl(
        qkv, rh_flat, rw_flat, scale, k_hw, num_heads, block_q, interpret
    )
    return out


def _rel_packed_ik_fwd(qkv, rh_flat, rw_flat, scale, k_hw, num_heads,
                       block_q, interpret):
    # when differentiated, the forward ALSO stores the selected rel terms
    # (d-lane padded per head) so the backward skips the candidate +
    # collapse matmul recompute — the most expensive part of the kernel
    out, relhw = _fused_rel_packed_ik_fwd_impl(
        qkv, rh_flat, rw_flat, scale, k_hw, num_heads, block_q, interpret,
        save_rel=True,
    )
    return out, (qkv, rh_flat, rw_flat, out, relhw)


def _rel_packed_ik_bwd_kernel(q_ref, k_ref, v_ref, thw_ref, rel_ref, o_ref,
                              g_ref, dq_ref, dk_ref, dv_ref, dthw_ref,
                              *, scale: float, k_h: int, k_w: int,
                              n_real: int, d: int, accum: bool = True,
                              recompute_rel: bool = False):
    gd = q_ref.shape[2]
    g_size = gd // d
    n_pad = k_ref.shape[1]
    q_h = n_real // k_w
    e_h_t, e_w_t = _onehot_expanders_t(k_h, k_w, n_pad, n_real, q_ref.dtype)
    scale_lo = jnp.asarray(scale, q_ref.dtype)
    padded = n_pad > n_real
    bq0 = q_ref.shape[1]
    row = (
        jax.lax.broadcasted_iota(jnp.int32, (bq0, 1), 0)
        + pl.program_id(2) * bq0
    )
    y_idx = row // k_w
    x_idx = row % k_w
    qmask = row < n_real
    if padded:
        kmask = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0) < n_real

    if accum:
        @pl.when(pl.program_id(2) == 0)
        def _():
            dk_ref[...] = jnp.zeros_like(dk_ref)
            dv_ref[...] = jnp.zeros_like(dv_ref)

    first = (
        (pl.program_id(0) == 0)
        & (pl.program_id(1) == 0)
        & (pl.program_id(2) == 0)
    )

    @pl.when(first)
    def _():
        dthw_ref[...] = jnp.zeros_like(dthw_ref)

    thw_t = thw_ref[...]
    collapse = _hw_collapse(q_h, k_h, k_w, k_w, q_ref.dtype)
    hw_mask = _hw_piece_mask(bq0, q_h, k_h, k_w, k_w, y_idx, x_idx)
    acc_hw = jnp.zeros(dthw_ref.shape, jnp.float32)
    for gi in range(g_size):
        sl = slice(gi * d, (gi + 1) * d)
        v = v_ref[0, :, sl]
        g = g_ref[0, :, sl]
        o = o_ref[0, :, sl]
        # mask q rows past n_real BEFORE the table-gradient dot so the
        # table gradient only sums real tokens
        q = jnp.where(qmask, q_ref[0, :, sl], 0)
        if recompute_rel:  # rel terms don't fit the d-lane residual slot
            rel_hw = _rel_select_hw(q, thw_t, collapse, hw_mask, q.dtype)
        else:
            # rel terms come from the forward's residual (first ka lanes
            # of the d-lane head slot) — no candidate/collapse recompute
            rel_hw = rel_ref[0, :, sl][:, : k_h + k_w]
        q_aug = jnp.concatenate([q * scale_lo, rel_hw], axis=1)
        k_aug = jnp.concatenate([k_ref[0, :, sl], e_h_t, e_w_t], axis=1)
        if padded:
            v = jnp.where(kmask, v, 0)
            g = jnp.where(qmask, g, 0)
            q_aug = jnp.where(qmask, q_aug, 0)
            k_aug = jnp.where(kmask, k_aug, 0)
        bq = q_aug.shape[0]

        s = jax.lax.dot_general(
            q_aug, k_aug, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if padded:
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, n_pad), 1)
            s = jnp.where(col < n_real, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if padded:
            p = jnp.where(qmask, p, 0.0)

        delta = jnp.sum(
            g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
            keepdims=True,
        )
        if padded:
            delta = jnp.where(qmask, delta, 0.0)

        p_lo = p.astype(v.dtype)
        dv_c = jax.lax.dot_general(
            p_lo, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            g, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        ds_lo = ds.astype(q_aug.dtype)
        dq_aug = jax.lax.dot_general(
            ds_lo, k_aug, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_aug = jax.lax.dot_general(
            ds_lo, q_aug, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # route the rel-term cotangents: dfull = scatter(drel) by y_n/x_n,
        # then dq += dfull @ thw and dthw += dfullᵀ @ q
        dfull_hw = _rel_scatter_hw(
            dq_aug[:, d:].astype(q.dtype), collapse, hw_mask
        )
        dq_rel = jax.lax.dot_general(
            dfull_hw, thw_t, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, :, sl] = (dq_aug[:, :d] * scale + dq_rel).astype(
            dq_ref.dtype
        )
        acc_hw = acc_hw + jax.lax.dot_general(
            dfull_hw, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if accum:
            dk_ref[0, :, sl] += dk_aug[:, :d]
            dv_ref[0, :, sl] += dv_c
        else:  # single q-block: no zero-init/read-modify-write round trip
            dk_ref[0, :, sl] = dk_aug[:, :d]
            dv_ref[0, :, sl] = dv_c
    dthw_ref[...] += acc_hw


def _rel_packed_ik_bwd(scale, k_hw, num_heads, block_q, interpret,
                       residuals, g):
    qkv, rh_flat, rw_flat, out, relhw = residuals
    b, n, three_hd = qkv.shape
    k_h, k_w = k_hw
    d = three_hd // (3 * num_heads)
    hd = num_heads * d
    if block_q is None:
        block_q = _pick_block_q(pad_for_attention(n, 128), n)
    grid, block_q, block_g, n_kblk, q_spec, k_spec, v_spec, _ = _packed_layout(
        b, n, num_heads, d, block_q, bwd=True, interpret=interpret,
        itemsize=jnp.dtype(qkv.dtype).itemsize, ka=k_h + k_w,
    )
    oi_spec = pl.BlockSpec((1, block_q, block_g * d), lambda b, g, i: (b, i, g))
    acc_spec = pl.BlockSpec((1, n_kblk, block_g * d), lambda b, g, i: (b, 0, g))
    thw = jnp.concatenate([rh_flat, rw_flat], axis=0)
    tab_spec = pl.BlockSpec(thw.shape, lambda b, g, i: (0, 0))
    if relhw is None:  # ka > d: residual slot too small, recompute in-kernel
        relhw, recompute_rel = out, True
    else:
        recompute_rel = False
    dq, dk, dv, dthw = pl.pallas_call(
        functools.partial(
            _rel_packed_ik_bwd_kernel,
            scale=scale, k_h=k_h, k_w=k_w, n_real=n, d=d,
            accum=grid[2] > 1, recompute_rel=recompute_rel,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, hd), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, n, hd), jnp.float32),
            jax.ShapeDtypeStruct(thw.shape, jnp.float32),
        ),
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec, tab_spec, oi_spec, oi_spec,
                  oi_spec],
        out_specs=(oi_spec, acc_spec, acc_spec, tab_spec),
        interpret=interpret,
    )(qkv, qkv, qkv, thw, relhw, out, g)
    dqkv = jnp.concatenate(
        [dq, dk.astype(qkv.dtype), dv.astype(qkv.dtype)], axis=-1
    )
    nh = rh_flat.shape[0]
    return (
        dqkv,
        dthw[:nh].astype(rh_flat.dtype),
        dthw[nh:].astype(rw_flat.dtype),
    )


fused_attention_rel_packed_ik.defvjp(_rel_packed_ik_fwd, _rel_packed_ik_bwd)


# ---------------------------------------------------------------------------
# grid-native windowed variant: NO window partition ever touches HBM. The
# kernels read 14x14 window tiles straight out of the UNPARTITIONED
# (B, Hg, Wg, 3*H*D) qkv-Dense grid via row-band BlockSpecs
# (1, ws, Wg_full, G*D) and carve the windows of each band in-kernel
# (reference partition semantics: ``image_encoder.py:246-267``). Window slots
# past the grid edge are filled with the qkv Dense BIAS (the reference pads x
# with zeros BEFORE the Dense, so pad tokens carry qkv = bias); the bias
# enters as a differentiable input so the pad-slot dk/dv gradient flows back
# to the bias parameter exactly as in the partition-first formulation (where
# pad tokens pass through the Dense). The context lands unpartitioned in the
# proj layout. This removes the partition/unpartition copies (~23 ms of a
# 94.5 ms ViT-B/512 b8 fwd+bwd step) AND lets the qkv Dense run on the
# unpadded grid (42% less Dense work at 512^2/window-14).
# ---------------------------------------------------------------------------


def _win_expanders(ws: int, dtype):
    """(ws*ws, ws) one-hot key expanders for a FULL window (every slot is a
    window slot — pad slots carry the rel bias too, as in the reference)."""
    n = ws * ws
    row = jax.lax.broadcasted_iota(jnp.int32, (n, ws), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, ws), 1)
    e_h_t = (row // ws == col).astype(dtype)
    e_w_t = (row % ws == col).astype(dtype)
    return e_h_t, e_w_t


def _win_divisors(num_heads: int):
    return [g for g in range(num_heads, 0, -1) if num_heads % g == 0]


def _pick_win_group(num_heads: int, d: int, ws: int, wg: int, itemsize: int,
                    bwd: bool, interpret: bool,
                    budget_bytes: int = 5 * 2**20):
    """Largest head group G with a legal lane block (G*D % 128 == 0 on TPU)
    whose per-cell VMEM footprint fits. Returns None if no G works.

    The budget is deliberately conservative (~1/3 of the 16 MB VMEM):
    Mosaic's measured stack allocation for these kernels runs ~2.5x this
    model (the unrolled window x head loop keeps many score-sized temps
    live)."""
    n = ws * ws
    for g in _win_divisors(num_heads):
        if not interpret and (g * d) % 128 != 0:
            continue
        gd = g * d
        band = ws * wg * gd * itemsize          # one qkv/ctx band block
        relb = 2 * g * ws * wg * ws * itemsize  # rel_h + rel_w band blocks
        if bwd:
            # in: q,k,v,o,g bands + rel; out: dq,dk,dv bands + drel (+db)
            streams = 2 * (8 * band + 2 * relb)
            temps = 6 * n * n * 4 + 8 * n * gd * itemsize
        else:
            streams = 2 * (4 * band + relb)
            temps = 3 * n * n * 4 + 5 * n * gd * itemsize
        if streams + temps <= budget_bytes:
            return g
    return None


def _win_attn_opted_in() -> bool:
    # read at call time (once per trace) so toggling MIA_WINDOWED_ATTN
    # after import — the A/B workflow the knob exists for — takes effect
    return os.environ.get("MIA_WINDOWED_ATTN", "0") not in ("0", "", "false")


def windowed_attention_available(num_heads: int, d: int, ws: int,
                                 hg: int, wg: int, itemsize: int = 2,
                                 interpret: bool = False) -> bool:
    """Whether the grid-native windowed kernels can run for this config.

    On real TPU the path is currently opt-in via MIA_WINDOWED_ATTN=1 while
    its Mosaic lowering is tuned (the first cut lowered correctly but ran
    far below the packed path); interpret mode (tests) always allows it.
    """
    if not interpret and not _win_attn_opted_in():
        return False
    if ws <= 0 or hg < ws or wg < ws:
        return False
    if _pick_win_group(num_heads, d, ws, wg, itemsize, True, interpret) is None:
        return False
    return _pick_win_group(num_heads, d, ws, wg, itemsize, False, interpret) is not None


def _win_carve(band, x0, x1, ws, fill):
    """Slice window columns [x0, x1) out of a (..., ws, Wg, C) band and pad
    the right edge with ``fill`` (broadcastable) up to ws columns."""
    win = band[..., :, x0:x1, :]
    pad = ws - (x1 - x0)
    if pad:
        shape = win.shape[:-2] + (pad, win.shape[-1])
        win = jnp.concatenate([win, jnp.broadcast_to(fill, shape)], axis=-2)
    return win


def _attn_rel_win_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, bias_ref, o_ref,
                         *, scale: float, ws: int, hg: int, wg: int, d: int):
    """Forward over one (batch, head-group, row-band) cell: carve each 14x14
    window from the band, flatten to (ws*ws, G*D), run the concat-K fused
    score+softmax+PV pass per head, write the context back into the band."""
    gd = q_ref.shape[3]
    g_size = gd // d
    n = ws * ws
    nwx = (wg + ws - 1) // ws
    e_h_t, e_w_t = _win_expanders(ws, q_ref.dtype)
    scale_lo = jnp.asarray(scale, q_ref.dtype)

    band_q, band_k, band_v = q_ref[0], k_ref[0], v_ref[0]  # (ws, Wg, gd)
    band_rh, band_rw = rh_ref[...], rw_ref[...]            # (G, ws, Wg, ws)
    bias_q = bias_ref[0][None, None, :]
    bias_k = bias_ref[1][None, None, :]
    bias_v = bias_ref[2][None, None, :]
    if hg % ws:
        # last band reads past the grid edge: replace garbage rows with the
        # qkv bias (pad-token semantics) / zeros (rel rows of pad queries).
        wy = pl.program_id(2)
        rowvalid = (jax.lax.broadcasted_iota(jnp.int32, (ws, 1, 1), 0)
                    + wy * ws) < hg
        band_q = jnp.where(rowvalid, band_q, bias_q)
        band_k = jnp.where(rowvalid, band_k, bias_k)
        band_v = jnp.where(rowvalid, band_v, bias_v)
        rv4 = rowvalid[None]
        band_rh = jnp.where(rv4, band_rh, 0)
        band_rw = jnp.where(rv4, band_rw, 0)

    for wx in range(nwx):
        x0 = wx * ws
        x1 = min(x0 + ws, wg)
        q3 = _win_carve(band_q, x0, x1, ws, bias_q)
        k3 = _win_carve(band_k, x0, x1, ws, bias_k)
        v3 = _win_carve(band_v, x0, x1, ws, bias_v)
        rh3 = _win_carve(band_rh, x0, x1, ws, jnp.zeros((), band_rh.dtype))
        rw3 = _win_carve(band_rw, x0, x1, ws, jnp.zeros((), band_rw.dtype))
        q2, k2, v2 = (t.reshape(n, gd) for t in (q3, k3, v3))
        for gi in range(g_size):
            sl = slice(gi * d, (gi + 1) * d)
            q_aug = jnp.concatenate(
                [q2[:, sl] * scale_lo, rh3[gi].reshape(n, ws),
                 rw3[gi].reshape(n, ws)], axis=1)
            k_aug = jnp.concatenate([k2[:, sl], e_h_t, e_w_t], axis=1)
            s = jax.lax.dot_general(
                q_aug, k_aug, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (n, n)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                (p / denom).astype(v2.dtype), v2[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o3 = o.astype(o_ref.dtype).reshape(ws, ws, d)
            o_ref[0, :, x0:x1, sl] = o3[:, : x1 - x0]


def _win_layout(b, hg, wg, num_heads, d, ws, itemsize, bwd, interpret):
    block_g = _pick_win_group(num_heads, d, ws, wg, itemsize, bwd, interpret)
    if block_g is None:
        raise ValueError(
            f"no windowed-attention tiling for heads={num_heads}, d={d}"
        )
    hgroups = num_heads // block_g
    nwy = (hg + ws - 1) // ws
    grid = (b, hgroups, nwy)
    gd = block_g * d

    def qkv_spec(part):  # part 0=q, 1=k, 2=v in the (3, H, D) lane layout
        return pl.BlockSpec(
            (1, ws, wg, gd),
            lambda b, g, wy, _p=part, _h=hgroups: (b, wy, 0, _p * _h + g),
        )

    rel_spec = pl.BlockSpec(
        (block_g, ws, wg, ws),
        lambda b, g, wy, _h=hgroups: (b * _h + g, wy, 0, 0),
    )
    bias_spec = pl.BlockSpec((3, gd), lambda b, g, wy: (0, g))
    ctx_spec = pl.BlockSpec((1, ws, wg, gd), lambda b, g, wy: (b, wy, 0, g))
    return grid, block_g, gd, qkv_spec, rel_spec, bias_spec, ctx_spec


def _fused_rel_win_fwd_impl(qkv, rel_h, rel_w, bias_kv, scale, ws, num_heads,
                            interpret):
    b, hg, wg, three_hd = qkv.shape
    d = three_hd // (3 * num_heads)
    grid, block_g, gd, qkv_spec, rel_spec, bias_spec, ctx_spec = _win_layout(
        b, hg, wg, num_heads, d, ws, jnp.dtype(qkv.dtype).itemsize,
        bwd=False, interpret=interpret,
    )
    return pl.pallas_call(
        functools.partial(
            _attn_rel_win_kernel, scale=scale, ws=ws, hg=hg, wg=wg, d=d
        ),
        out_shape=jax.ShapeDtypeStruct((b, hg, wg, num_heads * d), qkv.dtype),
        grid=grid,
        in_specs=[qkv_spec(0), qkv_spec(1), qkv_spec(2), rel_spec, rel_spec,
                  bias_spec],
        out_specs=ctx_spec,
        interpret=interpret,
    )(qkv, qkv, qkv, rel_h, rel_w, bias_kv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_attention_rel_win(qkv, rel_h, rel_w, bias_kv, scale, ws, num_heads,
                            interpret=False):
    """Windowed softmax(q.kT.scale + rel_h(+)rel_w).v on the UNPARTITIONED
    token grid.

    qkv: (B, Hg, Wg, 3*H*D) — the qkv Dense output on the unpadded grid
    (lane layout (3, H, D)). rel_h/rel_w: (B*H, Hg, Wg, ws) factored rel-pos
    terms of the REAL tokens in grid layout. bias_kv: (3, H*D) qkv Dense
    bias (zeros when the Dense has none) — fills pad window slots and
    receives their dk/dv gradient. Returns the context grid (B, Hg, Wg, H*D).
    """
    return _fused_rel_win_fwd_impl(
        qkv, rel_h, rel_w, bias_kv, scale, ws, num_heads, interpret
    )


def _rel_win_fwd(qkv, rel_h, rel_w, bias_kv, scale, ws, num_heads, interpret):
    out = _fused_rel_win_fwd_impl(
        qkv, rel_h, rel_w, bias_kv, scale, ws, num_heads, interpret
    )
    return out, (qkv, rel_h, rel_w, bias_kv, out)


def _attn_rel_win_bwd_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, bias_ref,
                             o_ref, g_ref, dq_ref, dk_ref, dv_ref, drh_ref,
                             drw_ref, db_ref, *, scale: float, ws: int,
                             hg: int, wg: int, d: int):
    """Flash-style backward; one q-block per window, so dq/dk/dv/drel are
    fully produced per cell (no cross-cell accumulation). Pad-slot dk/dv
    rows are folded into the per-batch bias-gradient accumulator ``db_ref``
    (rows: [dq≡0, dk_pad, dv_pad]) which the wrapper sums over batch."""
    gd = q_ref.shape[3]
    g_size = gd // d
    n = ws * ws
    nwx = (wg + ws - 1) // ws
    e_h_t, e_w_t = _win_expanders(ws, q_ref.dtype)
    scale_lo = jnp.asarray(scale, q_ref.dtype)
    wy = pl.program_id(2)

    band_q, band_k, band_v = q_ref[0], k_ref[0], v_ref[0]
    band_o, band_g = o_ref[0], g_ref[0]
    band_rh, band_rw = rh_ref[...], rw_ref[...]
    bias_q = bias_ref[0][None, None, :]
    bias_k = bias_ref[1][None, None, :]
    bias_v = bias_ref[2][None, None, :]
    zero = jnp.zeros((), band_q.dtype)
    pad_rows = bool(hg % ws)
    if pad_rows:
        rowvalid = (jax.lax.broadcasted_iota(jnp.int32, (ws, 1, 1), 0)
                    + wy * ws) < hg
        band_q = jnp.where(rowvalid, band_q, bias_q)
        band_k = jnp.where(rowvalid, band_k, bias_k)
        band_v = jnp.where(rowvalid, band_v, bias_v)
        # pad-row outputs were dropped -> zero cotangent; o rows are garbage
        # in HBM and must be zeroed so delta = sum(g*o) stays finite.
        band_o = jnp.where(rowvalid, band_o, 0)
        band_g = jnp.where(rowvalid, band_g, 0)
        rv4 = rowvalid[None]
        band_rh = jnp.where(rv4, band_rh, 0)
        band_rw = jnp.where(rv4, band_rw, 0)

    need_db = pad_rows or bool(wg % ws)
    db_k = [jnp.zeros((1, d), jnp.float32) for _ in range(g_size)]
    db_v = [jnp.zeros((1, d), jnp.float32) for _ in range(g_size)]
    if pad_rows:
        rowvalid_n = (
            jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) // ws + wy * ws
        ) < hg
    else:
        rowvalid_n = None

    for wx in range(nwx):
        x0 = wx * ws
        x1 = min(x0 + ws, wg)
        real_w = x1 - x0
        q3 = _win_carve(band_q, x0, x1, ws, bias_q)
        k3 = _win_carve(band_k, x0, x1, ws, bias_k)
        v3 = _win_carve(band_v, x0, x1, ws, bias_v)
        o3 = _win_carve(band_o, x0, x1, ws, zero)
        g3 = _win_carve(band_g, x0, x1, ws, zero)
        rh3 = _win_carve(band_rh, x0, x1, ws, jnp.zeros((), band_rh.dtype))
        rw3 = _win_carve(band_rw, x0, x1, ws, jnp.zeros((), band_rw.dtype))
        q2, k2, v2, o2, g2 = (t.reshape(n, gd) for t in (q3, k3, v3, o3, g3))
        if need_db:
            # window slots that are NOT real tokens: their dk/dv belongs to
            # the qkv bias parameter.
            colvalid_n = (
                jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) % ws
            ) < real_w
            padmask = jnp.logical_not(
                colvalid_n if rowvalid_n is None
                else jnp.logical_and(rowvalid_n, colvalid_n)
            )
        for gi in range(g_size):
            sl = slice(gi * d, (gi + 1) * d)
            v = v2[:, sl]
            g2h = g2[:, sl]
            q_aug = jnp.concatenate(
                [q2[:, sl] * scale_lo, rh3[gi].reshape(n, ws),
                 rw3[gi].reshape(n, ws)], axis=1)
            k_aug = jnp.concatenate([k2[:, sl], e_h_t, e_w_t], axis=1)
            s = jax.lax.dot_general(
                q_aug, k_aug, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            delta = jnp.sum(
                g2h.astype(jnp.float32) * o2[:, sl].astype(jnp.float32),
                axis=-1, keepdims=True,
            )
            p_lo = p.astype(v.dtype)
            dv_full = jax.lax.dot_general(
                p_lo, g2h, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (n, d)
            dp = jax.lax.dot_general(
                g2h, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - delta)
            ds_lo = ds.astype(q_aug.dtype)
            dq_aug = jax.lax.dot_general(
                ds_lo, k_aug, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk_full = jax.lax.dot_general(
                ds_lo, q_aug, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[:, :d]  # (n, d); E-part cotangent discarded (constants)

            dq3 = (dq_aug[:, :d] * scale).astype(dq_ref.dtype).reshape(ws, ws, d)
            drh3 = dq_aug[:, d:d + ws].astype(drh_ref.dtype).reshape(ws, ws, ws)
            drw3 = dq_aug[:, d + ws:].astype(drw_ref.dtype).reshape(ws, ws, ws)
            dk3 = dk_full.astype(dk_ref.dtype).reshape(ws, ws, d)
            dv3 = dv_full.astype(dv_ref.dtype).reshape(ws, ws, d)
            dq_ref[0, :, x0:x1, sl] = dq3[:, :real_w]
            dk_ref[0, :, x0:x1, sl] = dk3[:, :real_w]
            dv_ref[0, :, x0:x1, sl] = dv3[:, :real_w]
            drh_ref[gi, :, x0:x1, :] = drh3[:, :real_w]
            drw_ref[gi, :, x0:x1, :] = drw3[:, :real_w]
            if need_db:
                db_k[gi] += jnp.sum(
                    jnp.where(padmask, dk_full, 0.0), axis=0, keepdims=True
                )
                db_v[gi] += jnp.sum(
                    jnp.where(padmask, dv_full, 0.0), axis=0, keepdims=True
                )

    db_block = jnp.concatenate(
        [jnp.zeros((1, gd), jnp.float32),
         jnp.concatenate(db_k, axis=1),
         jnp.concatenate(db_v, axis=1)], axis=0,
    )

    @pl.when(wy == 0)
    def _():
        db_ref[0] = db_block

    @pl.when(wy != 0)
    def _():
        db_ref[0] += db_block


def _rel_win_bwd(scale, ws, num_heads, interpret, residuals, g):
    qkv, rel_h, rel_w, bias_kv, out = residuals
    b, hg, wg, three_hd = qkv.shape
    d = three_hd // (3 * num_heads)
    hd = num_heads * d
    grid, block_g, gd, qkv_spec, rel_spec, bias_spec, ctx_spec = _win_layout(
        b, hg, wg, num_heads, d, ws, jnp.dtype(qkv.dtype).itemsize,
        bwd=True, interpret=interpret,
    )
    db_spec = pl.BlockSpec((1, 3, gd), lambda b, g, wy: (b, 0, g))
    dq, dk, dv, drh, drw, db = pl.pallas_call(
        functools.partial(
            _attn_rel_win_bwd_kernel, scale=scale, ws=ws, hg=hg, wg=wg, d=d
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hg, wg, hd), qkv.dtype),
            jax.ShapeDtypeStruct((b, hg, wg, hd), qkv.dtype),
            jax.ShapeDtypeStruct((b, hg, wg, hd), qkv.dtype),
            jax.ShapeDtypeStruct((b * num_heads, hg, wg, ws), rel_h.dtype),
            jax.ShapeDtypeStruct((b * num_heads, hg, wg, ws), rel_w.dtype),
            jax.ShapeDtypeStruct((b, 3, hd), jnp.float32),
        ),
        grid=grid,
        in_specs=[qkv_spec(0), qkv_spec(1), qkv_spec(2), rel_spec, rel_spec,
                  bias_spec, ctx_spec, ctx_spec],
        out_specs=(ctx_spec, ctx_spec, ctx_spec, rel_spec, rel_spec, db_spec),
        interpret=interpret,
    )(qkv, qkv, qkv, rel_h, rel_w, bias_kv, out, g)
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    return dqkv, drh, drw, jnp.sum(db, axis=0).astype(bias_kv.dtype)


fused_attention_rel_win.defvjp(_rel_win_fwd, _rel_win_bwd)


def packed_attention_available(num_heads: int, d: int,
                               interpret: bool = False) -> bool:
    """Whether ``fused_attention_rel_packed`` has a legal tiling (the lane
    block G*D must be a multiple of 128 on TPU for some head group G)."""
    if interpret:
        return True
    return any((g * d) % 128 == 0 for g in _win_divisors(num_heads))
