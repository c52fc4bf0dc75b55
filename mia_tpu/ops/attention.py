"""Fused multi-head attention Pallas kernel for the SAM ViT.

The encoder's attention (windowed 196-token and global ≤4096-token
sequences, ``image_encoder.py``) is the CPC-SAM FLOPs hot spot. XLA
materializes the (B·heads, N, N) score tensor in HBM between the two
matmuls; this kernel keeps a q-block's scores in VMEM, fusing
``scores → (+bias) → softmax → @v`` into one pass per (batch·head,
q-block) grid cell. The decomposed rel-pos bias rides in as an additive
(B·heads, N, N) operand.

Gradients: ``fused_attention`` carries a custom VJP whose backward is the
standard einsum attention gradient (XLA) — fused forward speed, exact
grads. Sequences are padded to the q-block size by the caller with
``bias = -inf`` on padded keys.

On non-TPU backends the kernel runs in Pallas interpret mode (tests), so
one code path serves everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0].astype(jnp.float32)  # (N, D)
    v = v_ref[0].astype(jnp.float32)  # (N, D)
    s = jax.lax.dot_general(
        q * scale,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, N)
    s = s + bias_ref[0].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


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


def _attn_rel_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *,
                     scale: float, k_h: int, k_w: int, n_real: int):
    """Reshape-free bias expansion: Mosaic cannot lane-split a (BQ, N)
    vector into (BQ, k_h, k_w), so the factored bias is expanded through two
    small one-hot matmuls built from iota —
    ``bias = rel_h @ E_h + rel_w @ E_w`` with
    ``E_h[i, j] = [j // k_w == i]``, ``E_w[i, j] = [j % k_w == i]``."""
    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0].astype(jnp.float32)  # (N_pad, D)
    v = v_ref[0].astype(jnp.float32)
    bq = q.shape[0]
    n_pad = k.shape[0]
    s = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, N_pad)
    rel_h = rh_ref[0].astype(jnp.float32)  # (BQ, k_h)
    rel_w = rw_ref[0].astype(jnp.float32)  # (BQ, k_w)

    col_h = jax.lax.broadcasted_iota(jnp.int32, (k_h, n_pad), 1)
    row_h = jax.lax.broadcasted_iota(jnp.int32, (k_h, n_pad), 0)
    e_h = ((col_h // k_w == row_h) & (col_h < n_real)).astype(jnp.float32)
    col_w = jax.lax.broadcasted_iota(jnp.int32, (k_w, n_pad), 1)
    row_w = jax.lax.broadcasted_iota(jnp.int32, (k_w, n_pad), 0)
    e_w = ((col_w % k_w == row_w) & (col_w < n_real)).astype(jnp.float32)

    s = s + jax.lax.dot_general(
        rel_h, e_h, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + jax.lax.dot_general(
        rel_w, e_w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if n_pad > n_real:
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, n_pad), 1)
        s = jnp.where(col < n_real, s, _NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _fused_rel_fwd_impl(q, k, v, rel_h, rel_w, scale, k_hw, block_q, interpret):
    bh, n_pad, d = q.shape
    k_h, k_w = k_hw
    n_real = k_h * k_w
    grid = (bh, n_pad // block_q)
    return pl.pallas_call(
        functools.partial(
            _attn_rel_kernel, scale=scale, k_h=k_h, k_w=k_w, n_real=n_real
        ),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n_pad, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, n_pad, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, k_h), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, k_w), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(q, k, v, rel_h, rel_w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_attention_rel(q, k, v, rel_h, rel_w, scale, k_hw, block_q=128,
                        interpret=False):
    """softmax(q·kᵀ·scale + rel_h⊕rel_w)·v with the decomposed rel-pos bias
    applied IN-KERNEL (``rel_h`` (BH, N_pad, k_h), ``rel_w`` (BH, N_pad,
    k_w)); keys beyond ``k_hw[0]*k_hw[1]`` are masked as padding."""
    return _fused_rel_fwd_impl(q, k, v, rel_h, rel_w, scale, k_hw, block_q, interpret)


def _rel_fwd(q, k, v, rel_h, rel_w, scale, k_hw, block_q, interpret):
    out = _fused_rel_fwd_impl(q, k, v, rel_h, rel_w, scale, k_hw, block_q, interpret)
    return out, (q, k, v, rel_h, rel_w)


def _rel_bwd(scale, k_hw, block_q, interpret, residuals, g):
    """Backward over the REAL keys only: padded keys have p = 0, so every
    einsum runs on the n_real slice and the dense −inf bias tensor is never
    built. The reshape-based bias add fuses in XLA (outside Mosaic)."""
    q, k, v, rel_h, rel_w = residuals
    k_h, k_w = k_hw
    n_real = k_h * k_w
    bh, n_pad, d = q.shape
    q32 = q.astype(jnp.float32)
    k32 = k[:, :n_real].astype(jnp.float32)
    v32 = v[:, :n_real].astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    s = jnp.einsum("bqd,bkd->bqk", q32 * scale, k32)  # (BH, N_pad, n_real)
    s = s.reshape(bh, n_pad, k_h, k_w)
    s = s + rel_h.astype(jnp.float32)[:, :, :, None]
    s = s + rel_w.astype(jnp.float32)[:, :, None, :]
    p = jax.nn.softmax(s.reshape(bh, n_pad, n_real), axis=-1)
    dv = jnp.einsum("bqk,bqd->bkd", p, g32)
    dp = jnp.einsum("bqd,bkd->bqk", g32, v32)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq = jnp.einsum("bqk,bkd->bqd", ds, k32) * scale
    dk = jnp.einsum("bqk,bqd->bkd", ds, q32) * scale
    ds_real = ds.reshape(bh, n_pad, k_h, k_w)
    drel_h = jnp.sum(ds_real, axis=3)
    drel_w = jnp.sum(ds_real, axis=2)
    pad = n_pad - n_real
    if pad:
        dk = jnp.pad(dk, ((0, 0), (0, pad), (0, 0)))
        dv = jnp.pad(dv, ((0, 0), (0, pad), (0, 0)))
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        drel_h.astype(rel_h.dtype),
        drel_w.astype(rel_w.dtype),
    )


fused_attention_rel.defvjp(_rel_fwd, _rel_bwd)


def attention_rel_with_padding(q, k, v, rel_h, rel_w, scale, k_hw, block_q=128):
    """Pad the token axis to the q-block size, run the decomposed-bias fused
    kernel, slice back."""
    bh, n, d = q.shape
    np_ = pad_for_attention(n, block_q)
    interpret = jax.default_backend() != "tpu"
    if np_ != n:
        pad = np_ - n
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        rel_h = jnp.pad(rel_h, ((0, 0), (0, pad), (0, 0)))
        rel_w = jnp.pad(rel_w, ((0, 0), (0, pad), (0, 0)))
    out = fused_attention_rel(q, k, v, rel_h, rel_w, scale, k_hw, block_q, interpret)
    return out[:, :n]
