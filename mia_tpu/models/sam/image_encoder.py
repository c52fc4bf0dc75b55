"""SAM ViT image encoder (reference
``src/models/segment_anything/modeling/image_encoder.py``).

TPU-first notes: channel-last throughout; window partition is pure
reshape/transpose (static shapes); decomposed relative positions use
precomputed static gather indices; attention runs as batched einsums on the
MXU with a ``compute_dtype`` knob for bfloat16. LoRA adapters on q,v hook in
via ``lora_rank`` (see ``lora.py`` — the reference wraps torch ``qkv``
modules at runtime, ``sam_lora_image_encoder.py:83-104``; in flax the
adapters are declared parameters so the train step stays one jitted
program).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import LayerNorm2d, MLPBlock


def window_partition(x: jnp.ndarray, window_size: int):
    """(B, H, W, C) → (B·nW, ws, ws, C) with zero padding (``:246-267``)."""
    b, h, w, c = x.shape
    pad_h = (window_size - h % window_size) % window_size
    pad_w = (window_size - w % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window_size, window_size, wp // window_size, window_size, c)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, c)
    return windows, (hp, wp)


def window_unpartition(windows, window_size: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window_size // window_size)
    x = windows.reshape(
        b, hp // window_size, wp // window_size, window_size, window_size, -1
    )
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


import functools


@functools.lru_cache(maxsize=16)
def _partition_onehot(h: int, w: int, ws: int) -> np.ndarray:
    """Static (nW·ws·ws, h·w) 0/1 matrix mapping the token-major grid to
    the windowed layout (row order = window_partition's output order);
    pad slots are all-zero rows, so P@x zero-fills them exactly like the
    reference's pre-partition ``jnp.pad``."""
    hp = -(-h // ws) * ws
    wp = -(-w // ws) * ws
    nwy, nwx = hp // ws, wp // ws
    p = np.zeros((nwy * nwx * ws * ws, h * w), np.float32)
    m = 0
    for wy in range(nwy):
        for wx in range(nwx):
            for dy in range(ws):
                for dx in range(ws):
                    y, x = wy * ws + dy, wx * ws + dx
                    if y < h and x < w:
                        p[m, y * w + x] = 1.0
                    m += 1
    return p


def window_partition_matmul(x: jnp.ndarray, window_size: int):
    """``window_partition`` as a one-hot einsum (exact: every output row
    selects exactly one token or is a zero pad slot).

    The idea (same trick as ``transforms.affine_warp_twopass``): ride the
    MXU instead of the reshape/transpose sublane shuffle. Measured
    NEGATIVE in the ViT-B/512 encoder (fwd+bwd device busy 97.8 ms vs
    93.1 ms with the reshape lowering — the einsum GEMMs cost more than
    the copies they replace, and XLA's dominant data-formatting time
    turns out to be qkv-cotangent layout copies the partition choice
    doesn't touch; docs/PERF.md §8). Kept exact-parity-tested for grids
    where a permutation matmul wins; the production encoder uses
    ``window_partition``. Backward is automatically the transposed
    (unpartition) einsum."""
    b, h, w, c = x.shape
    ws = window_size
    p = jnp.asarray(_partition_onehot(h, w, ws), x.dtype)
    hp, wp = -(-h // ws) * ws, -(-w // ws) * ws
    win = jnp.einsum("mn,bnc->bmc", p, x.reshape(b, h * w, c))
    return win.reshape(-1, ws, ws, c), (hp, wp)


def window_unpartition_matmul(windows, window_size: int, pad_hw, hw):
    """Exact inverse of ``window_partition_matmul`` (each real token lives
    in exactly one window row, pad rows drop out)."""
    hp, wp = pad_hw
    h, w = hw
    ws = window_size
    nw = (hp // ws) * (wp // ws)
    b = windows.shape[0] // nw
    p = jnp.asarray(_partition_onehot(h, w, ws), windows.dtype)
    y = jnp.einsum(
        "mn,bmc->bnc", p, windows.reshape(b, nw * ws * ws, windows.shape[-1])
    )
    return y.reshape(b, h, w, windows.shape[-1])


def _rel_pos_indices(q_size: int, k_size: int) -> np.ndarray:
    """Static gather indices into a (2·max(q,k)−1, C) rel-pos table
    (``get_rel_pos``, ``:283-311``)."""
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel.astype(np.int64)


def resize_rel_pos(rel_pos: jnp.ndarray, max_rel_dist: int) -> jnp.ndarray:
    """Linear 1-D interpolation of a rel-pos table to a new length (torch
    ``F.interpolate(mode="linear")``, align_corners=False)."""
    n = rel_pos.shape[0]
    if n == max_rel_dist:
        return rel_pos
    pos = (jnp.arange(max_rel_dist) + 0.5) * n / max_rel_dist - 0.5
    lo = jnp.clip(jnp.floor(pos), 0, n - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, n - 1)
    frac = jnp.clip(pos - lo, 0.0, 1.0)[:, None]
    return rel_pos[lo] * (1 - frac) + rel_pos[hi] * frac


def decomposed_rel_terms(q, rel_pos_h, rel_pos_w, q_size, k_size):
    """The two factored rel-pos terms: (B, heads, q_h·q_w, k_h) and
    (…, k_w). Their broadcast-sum is the MViTv2 bias — kept factored for
    the fused kernel so the (N, N) bias never materializes."""
    q_h, q_w = q_size
    k_h, k_w = k_size
    rh = resize_rel_pos(rel_pos_h, 2 * max(q_h, k_h) - 1)[
        jnp.asarray(_rel_pos_indices(q_h, k_h))
    ]
    rw = resize_rel_pos(rel_pos_w, 2 * max(q_w, k_w) - 1)[
        jnp.asarray(_rel_pos_indices(q_w, k_w))
    ]
    b, heads = q.shape[0], q.shape[1]
    r_q = q.reshape(b, heads, q_h, q_w, -1)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, rh.astype(q.dtype))
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, rw.astype(q.dtype))
    n = q_h * q_w
    return rel_h.reshape(b, heads, n, k_h), rel_w.reshape(b, heads, n, k_w)


def decomposed_rel_terms_packed(q4, rel_pos_h, rel_pos_w, q_size, k_size):
    """Same factored rel-pos terms but from TOKEN-major q (B, N, heads, C)
    — the qkv Dense output layout — so no head transpose is materialized.
    Returns head-major (B·heads, N, k_h) / (…, k_w) for the packed kernel."""
    q_h, q_w = q_size
    k_h, k_w = k_size
    rh = resize_rel_pos(rel_pos_h, 2 * max(q_h, k_h) - 1)[
        jnp.asarray(_rel_pos_indices(q_h, k_h))
    ]
    rw = resize_rel_pos(rel_pos_w, 2 * max(q_w, k_w) - 1)[
        jnp.asarray(_rel_pos_indices(q_w, k_w))
    ]
    b, heads = q4.shape[0], q4.shape[2]
    r_q = q4.reshape(b, q_h, q_w, heads, -1)
    rel_h = jnp.einsum("byxhc,ykc->bhyxk", r_q, rh.astype(q4.dtype))
    rel_w = jnp.einsum("byxhc,xkc->bhyxk", r_q, rw.astype(q4.dtype))
    n = q_h * q_w
    return (
        rel_h.reshape(b * heads, n, k_h),
        rel_w.reshape(b * heads, n, k_w),
    )


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_size, k_size):
    """MViTv2 decomposed rel-pos bias (``:314-351``). ``attn`` is
    (B, heads, q_h·q_w, k_h·k_w); ``q`` (B, heads, q_h·q_w, C)."""
    q_h, q_w = q_size
    k_h, k_w = k_size
    rel_h, rel_w = decomposed_rel_terms(q, rel_pos_h, rel_pos_w, q_size, k_size)
    b, heads = q.shape[0], q.shape[1]
    attn = attn.reshape(b, heads, q_h, q_w, k_h, k_w)
    attn = attn + rel_h.reshape(b, heads, q_h, q_w, k_h)[..., :, None]
    attn = attn + rel_w.reshape(b, heads, q_h, q_w, k_w)[..., None, :]
    return attn.reshape(b, heads, q_h * q_w, k_h * k_w)


def _window_pad_mask(pad_hw, hw, ws: int) -> np.ndarray:
    """Static (nW, ws, ws, 1) 0/1 mask of REAL tokens in the partitioned
    layout (used by shared-partition runs to re-zero pad tokens, which is
    exactly what a fresh ``window_partition`` after LN1 would produce)."""
    hp, wp = pad_hw
    h, w = hw
    nwy, nwx = hp // ws, wp // ws
    rows = (np.arange(nwy)[:, None] * ws + np.arange(ws)[None, :]) < h
    cols = (np.arange(nwx)[:, None] * ws + np.arange(ws)[None, :]) < w
    mask = rows[:, None, :, None] & cols[None, :, None, :]
    return mask.reshape(nwy * nwx, ws, ws, 1).astype(np.float32)


class Attention(nn.Module):
    """Multi-head attention with optional decomposed rel-pos and optional
    LoRA adapters on q and v (``image_encoder.py:185-240`` +
    ``sam_lora_image_encoder.py:11-42``).

    On TPU the scores→softmax→@v pass runs as a fused Pallas kernel
    (``mia_tpu.ops.attention``) per (batch·head, q-block) instead of
    materializing the score tensor in HBM; elsewhere (and with
    ``fused="never"``) the plain einsum path runs.

    ``pre_windowed``: the input is ALREADY in the partitioned
    (B·nW, ws, ws, C) layout (shared across a run of consecutive windowed
    blocks); pad tokens are re-zeroed in place of a fresh partition and the
    context is returned without unpartitioning. ``grid_hw`` carries the
    static ((hp, wp), (h, w)) geometry for the pad mask.

    ``windowed_input``: the input is in the partitioned (B·nW, ws, ws, C)
    layout with EXACTLY-ZERO pad tokens (the fused LN+partition kernel's
    output, ``ops/ln_window.py``); no partition or re-masking happens here
    and the output IS unpartitioned back to the grid via ``grid_hw`` —
    unless ``windowed_output`` is set, in which case proj runs on the
    windowed tokens (linear per token; pad-slot outputs are garbage the
    consumer must drop) and the (B·nW, ws, ws, dim) layout is returned
    for the fused unpartition+residual+norm2 kernel
    (``ops/unpartition_residual.py``)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    use_rel_pos: bool = False
    input_size: Tuple[int, int] | None = None
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32
    fused: str = "auto"  # "auto" | "always" | "never"
    window_size: int = 0  # 0 = global; >0 = window attention handled here
    pre_windowed: bool = False
    windowed_input: bool = False
    windowed_output: bool = False
    grid_hw: Tuple[Tuple[int, int], Tuple[int, int]] | None = None

    @nn.compact
    def __call__(self, x):
        b, full_h, full_w, _ = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5
        ws = self.window_size

        already_windowed = (self.pre_windowed or self.windowed_input) and ws > 0
        if self.pre_windowed and ws > 0:
            # shared-partition run: input is (B·nW, ws, ws, C) with stale pad
            # tokens; re-zeroing them reproduces exactly what a fresh
            # ``window_partition`` of the post-LN1 grid would contain.
            pad_hw, hw_real = self.grid_hw
            mask = jnp.asarray(
                _window_pad_mask(pad_hw, hw_real, ws), self.dtype
            )
            nw = mask.shape[0]
            x = (x.reshape(b // nw, nw, ws, ws, -1) * mask[None]).reshape(
                x.shape
            )

        qkv_dense = nn.Dense(
            self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv"
        )
        proj = nn.Dense(self.dim, dtype=self.dtype, name="proj")
        # LoRA modules constructed ONCE so compute_qkv may be called more
        # than once (e.g. the grid-native path's bias_kv probe) with flax
        # parameter sharing instead of a NameInUseError
        lora_mods = {
            nm: (
                nn.Dense(self.lora_rank, use_bias=False, dtype=self.dtype,
                         name=f"lora_a_{nm}"),
                nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros,
                         name=f"lora_b_{nm}"),
            )
            for nm in (("q", "v") if self.lora_rank > 0 else ())
        }

        def compute_qkv_flat(y):
            """(B', H', W', C) → (B', N', 3·dim) — the raw Dense layout.

            LoRA adds land on contiguous last-axis slices (q = [..., :dim],
            v = [..., 2·dim:], identical bytes to the 5D slot adds). The
            packed attention path consumes THIS layout end-to-end so the
            backward's qkv cotangent stays in one layout for the kernel,
            the rel-term einsums, and the Dense gradient GEMMs (the 5D
            round-trip used to cost ~10 ms of layout copies per encoder
            fwd+bwd — docs/PERF.md §8)."""
            bb, hh, ww, _ = y.shape
            # flatten tokens BEFORE the Dense: on the 4D (B', 14, 14, C)
            # operand XLA assigns the GEMM a {3,0,2,1} output layout and
            # then pays a ~0.1 ms copy per block to feed the row-major
            # Pallas kernel operand; on the 3D token view the GEMM output
            # is already the kernel's layout
            y = y.reshape(bb, hh * ww, y.shape[-1])
            qkv = qkv_dense(y)
            if self.lora_rank > 0:
                # frozen-base LoRA: q += x @ A_q @ B_q ; v += x @ A_v @ B_v
                def lora(name):
                    a_mod, b_mod = lora_mods[name]
                    return b_mod(a_mod(y))

                qkv = qkv.at[..., : self.dim].add(lora("q"))
                qkv = qkv.at[..., 2 * self.dim :].add(lora("v"))
            return qkv

        def compute_qkv(y):
            """(B', H', W', C) → (B', N', 3, heads, head_dim)."""
            bb, hh, ww, _ = y.shape
            return compute_qkv_flat(y).reshape(
                bb, hh * ww, 3, self.num_heads, head_dim
            )

        if self.use_rel_pos:
            size = self.input_size
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * size[0] - 1, head_dim)
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * size[1] - 1, head_dim)
            )

        use_fused = self.fused == "always" or (
            self.fused == "auto" and jax.default_backend() == "tpu"
        )

        if use_fused and self.use_rel_pos:
            from ...ops.attention import (
                attention_rel_with_padding,
                fused_attention_rel_packed,
                fused_attention_rel_packed_ik,
                fused_attention_rel_win,
                packed_attention_available,
                windowed_attention_available,
            )

            interpret = jax.default_backend() != "tpu"
            itemsize = jnp.dtype(self.dtype).itemsize

            if ws > 0 and not already_windowed and windowed_attention_available(
                self.num_heads, head_dim, ws, full_h, full_w, itemsize,
                interpret,
            ):
                # grid-native windowed path: NO partition copy ever touches
                # HBM. The qkv Dense runs on the UNPADDED grid (42% less
                # Dense work at 512²/window-14) and the kernel carves 14×14
                # window tiles straight out of the qkv tensor; pad window
                # slots are filled in-kernel with the qkv bias (the reference
                # pads x with zeros BEFORE the Dense, ``:246-267``), whose
                # gradient flows back through ``bias_kv``.
                qkv = compute_qkv(x)  # (B, N, 3, heads, head_dim)
                rh = resize_rel_pos(rel_pos_h, 2 * ws - 1)[
                    jnp.asarray(_rel_pos_indices(ws, ws))
                ]  # (ws, ws, head_dim)
                rw = resize_rel_pos(rel_pos_w, 2 * ws - 1)[
                    jnp.asarray(_rel_pos_indices(ws, ws))
                ]
                rh_mod = rh[np.arange(full_h) % ws]  # (Hg, ws, head_dim)
                rw_mod = rw[np.arange(full_w) % ws]
                q5 = qkv[:, :, 0].reshape(
                    b, full_h, full_w, self.num_heads, head_dim
                )
                rel_h = jnp.einsum(
                    "byxhc,ykc->bhyxk", q5, rh_mod.astype(q5.dtype)
                ).reshape(b * self.num_heads, full_h, full_w, ws)
                rel_w = jnp.einsum(
                    "byxhc,xkc->bhyxk", q5, rw_mod.astype(q5.dtype)
                ).reshape(b * self.num_heads, full_h, full_w, ws)
                # W·0 + b = b: the Dense bias as a differentiable value (the
                # pad-slot dk/dv gradient must reach the bias param, exactly
                # as when pad tokens pass through the Dense).
                bias_kv = compute_qkv(
                    jnp.zeros((1, 1, 1, x.shape[-1]), x.dtype)
                ).reshape(3, self.dim)
                ctx = fused_attention_rel_win(
                    qkv.reshape(b, full_h, full_w, 3 * self.dim),
                    rel_h, rel_w, bias_kv, scale, ws, self.num_heads,
                    interpret,
                )
                return proj(ctx.astype(self.dtype))

            if packed_attention_available(self.num_heads, head_dim, interpret):
                # packed path: q/k/v are consumed straight out of the qkv
                # Dense layout and the context lands in the proj Dense layout
                # — no head-major transposes touch HBM. Windows are
                # partitioned BEFORE the Dense (reference ordering; the
                # unpadded-Dense variant of this path was abandoned — the
                # 3×-wider partition copy outweighed the Dense savings, see
                # docs/PERF.md — and is superseded by the grid-native path
                # above).
                if ws > 0 and not already_windowed:
                    x, pad_hw = window_partition(x, ws)
                    h = w = ws
                elif ws > 0:
                    h = w = ws
                else:
                    h, w = full_h, full_w
                bw = x.shape[0]
                n = h * w
                # stay in the flat token-major qkv layout: kernel, rel-term
                # einsums, and the Dense backward all see ONE layout, so the
                # qkv cotangent needs no 5D↔3D normalization copies
                qkv = compute_qkv_flat(x)
                if ws > 0:
                    # windowed: rel TERMS computed IN-KERNEL from the tiny
                    # gathered tables — the out-of-kernel einsum's operand/
                    # result transposes were ~5 ms of the encoder fwd+bwd
                    # (docs/PERF.md §16); candidate-matmul cost is trivial
                    # at 14×14 windows
                    rh = resize_rel_pos(rel_pos_h, 2 * ws - 1)[
                        jnp.asarray(_rel_pos_indices(ws, ws))
                    ]  # (ws, ws, head_dim)
                    rw = resize_rel_pos(rel_pos_w, 2 * ws - 1)[
                        jnp.asarray(_rel_pos_indices(ws, ws))
                    ]
                    out = fused_attention_rel_packed_ik(
                        qkv,
                        rh.reshape(ws * ws, head_dim).astype(self.dtype),
                        rw.reshape(ws * ws, head_dim).astype(self.dtype),
                        scale,
                        (h, w),
                        self.num_heads,
                        None,
                        interpret,
                    )
                else:
                    rel_h, rel_w = decomposed_rel_terms_packed(
                        qkv[..., : self.dim].reshape(
                            bw, n, self.num_heads, head_dim
                        ),
                        rel_pos_h, rel_pos_w, (h, w), (h, w),
                    )
                    out = fused_attention_rel_packed(
                        qkv,
                        rel_h,
                        rel_w,
                        scale,
                        (h, w),
                        self.num_heads,
                        None,
                        interpret,
                    )
                if self.windowed_input and self.windowed_output:
                    # proj on the flat windowed tokens (row-major GEMM
                    # output layout — the fused unpartition kernel's
                    # operand); pad-slot rows cost ~0.05 ms of extra
                    # 768²-GEMM and their outputs are dropped by the
                    # kernel's band join
                    out = proj(out.astype(self.dtype))
                    return out.reshape(bw, h, w, self.dim)
                out = out.astype(self.dtype).reshape(bw, h, w, self.dim)
                if ws > 0 and not already_windowed:
                    out = window_unpartition(out, ws, pad_hw, (full_h, full_w))
                elif self.windowed_input:
                    out = window_unpartition(
                        out, ws, self.grid_hw[0], self.grid_hw[1]
                    )
                # proj commutes with the unpartition slice (linear per token)
                return proj(out)

            # head-major fused fallback: no packed lane tiling exists for
            # this (heads, head_dim) — e.g. tiny test configs where no head
            # group G has (G·head_dim) % 128 == 0. The d-lane kernel blocks
            # of this path are always legal.
            if ws > 0 and not already_windowed:
                x, pad_hw = window_partition(x, ws)
                h = w = ws
            elif ws > 0:
                h = w = ws
            else:
                h, w = full_h, full_w
            bw = x.shape[0]
            n = h * w
            qkv = compute_qkv(x)
            q = qkv[:, :, 0].transpose(0, 2, 1, 3)
            k = qkv[:, :, 1].transpose(0, 2, 1, 3)
            v = qkv[:, :, 2].transpose(0, 2, 1, 3)
            rel_h, rel_w = decomposed_rel_terms(
                q, rel_pos_h, rel_pos_w, (h, w), (h, w)
            )
            bh = bw * self.num_heads
            out = attention_rel_with_padding(
                q.reshape(bh, n, head_dim),
                k.reshape(bh, n, head_dim),
                v.reshape(bh, n, head_dim),
                rel_h.reshape(bh, n, h),
                rel_w.reshape(bh, n, w),
                scale,
                (h, w),
            )
            out = out.reshape(bw, self.num_heads, n, head_dim)
            out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(
                bw, h, w, self.dim
            )
            if ws > 0 and not already_windowed:
                out = window_unpartition(out, ws, pad_hw, (full_h, full_w))
            elif self.windowed_input:
                if self.windowed_output:
                    return proj(out)
                out = window_unpartition(out, ws, self.grid_hw[0], self.grid_hw[1])
            return proj(out)

        if ws > 0 and not already_windowed:
            # reference ordering: pad+partition the INPUT, Dense on windows
            x, pad_hw = window_partition(x, ws)
            h = w = ws
        elif ws > 0:
            h = w = ws
        else:
            h, w = full_h, full_w
        bw = x.shape[0]
        n = h * w
        qkv = compute_qkv(x)

        q = qkv[:, :, 0].transpose(0, 2, 1, 3)  # (B, heads, N, C)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)

        if use_fused:
            from ...ops.attention import attention_with_padding

            bh = bw * self.num_heads
            bias = jnp.zeros((bh, n, n), jnp.float32)
            out = attention_with_padding(
                q.reshape(bh, n, head_dim),
                k.reshape(bh, n, head_dim),
                v.reshape(bh, n, head_dim),
                bias,
                scale,
            )
            out = out.reshape(bw, self.num_heads, n, head_dim)
        else:
            attn = jnp.einsum(
                "bnqc,bnkc->bnqk", q * scale, k, preferred_element_type=jnp.float32
            )
            if self.use_rel_pos:
                attn = add_decomposed_rel_pos(
                    attn, q, rel_pos_h, rel_pos_w, (h, w), (h, w)
                )
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
            out = jnp.einsum(
                "bnqk,bnkc->bnqc", attn, v, preferred_element_type=jnp.float32
            )

        out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(bw, h, w, self.dim)
        if ws > 0 and not already_windowed:
            out = window_unpartition(out, ws, pad_hw, (full_h, full_w))
        elif self.windowed_input:
            if self.windowed_output:
                return proj(out)
            out = window_unpartition(out, ws, self.grid_hw[0], self.grid_hw[1])
        return proj(out)


class _LNParams(nn.Module):
    """norm1's parameters for the fused LN+partition path — declared under
    the SAME module name/param names as ``nn.LayerNorm`` so checkpoints and
    torch imports are byte-identical either way."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


class Block(nn.Module):
    """Transformer block with window/global attention (``:119-182``).

    ``pre_windowed``: the block runs inside a shared-partition run — its
    input/output stay in the (B·nW, ws, ws, C) layout and Attention re-zeros
    pad tokens instead of re-partitioning (numerically identical for every
    real token: LN/MLP/residual are per-token).

    ``fuse_ln_window``: run ``window_partition(LayerNorm(x))`` as ONE Pallas
    kernel each way (``ops/ln_window.py``) instead of an XLA LN fusion (with
    bf16↔f32 converts) followed by a partition copy — "auto" enables it on
    TPU for windowed blocks whenever the channel count tiles.

    ``fuse_unpart_residual``: the symmetric exit fusion — attention's proj
    output stays windowed and ``unpartition + residual-add + norm2`` run as
    ONE Pallas kernel (``ops/unpartition_residual.py``); requires the
    fused LN+partition entry (same layout contract). Default OFF: measured
    NEUTRAL-to-negative on a v5e at ViT-B/512 b8 (device busy 69.6 →
    70.2 ms, fwd+bwd 110.6 → 108.6 img/s) — by round 4 the exit
    unpartition/add/norm2 were already absorbed into XLA's loop fusions
    (whole-step data formatting is ~4 ms), so the kernel replaces
    already-fused ops and adds pad-token proj work (docs/PERF.md §23)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_rel_pos: bool = False
    window_size: int = 0
    input_size: Tuple[int, int] | None = None
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32
    fused: str = "auto"
    pre_windowed: bool = False
    grid_hw: Tuple[Tuple[int, int], Tuple[int, int]] | None = None
    fuse_ln_window: str = "auto"  # "auto" | "always" | "never"
    fuse_unpart_residual: str = "never"  # "always" | "never" (measured neutral)

    @nn.compact
    def __call__(self, x):
        from ...ops.ln_window import ln_window_available, ln_window_partition
        from ...ops.unpartition_residual import (
            unpartition_add_ln,
            unpartition_add_ln_available,
        )

        shortcut = x
        ws = self.window_size
        interpret = jax.default_backend() != "tpu"
        use_lnw = (
            ws > 0
            and not self.pre_windowed
            and self.fuse_ln_window != "never"
            and (
                self.fuse_ln_window == "always"
                or (not interpret and self.fused in ("auto", "always"))
            )
            and ln_window_available(x.shape[-1], ws, interpret, x.shape[2])
        )
        use_upr = (
            use_lnw
            and self.fuse_unpart_residual != "never"
            and unpartition_add_ln_available(
                shortcut.shape[-1], ws, interpret, shortcut.shape[2]
            )
        )
        if use_lnw:
            ln_scale, ln_bias = _LNParams(self.dim, name="norm1")()
            hw = (x.shape[1], x.shape[2])
            pad_hw = (-(-hw[0] // ws) * ws, -(-hw[1] // ws) * ws)
            x = ln_window_partition(x, ln_scale, ln_bias, ws,
                                    interpret=interpret)
        else:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        # window partitioning happens INSIDE Attention (lets the
        # grid-native fused path run the qkv Dense on the unpadded grid;
        # the packed path partitions first, then runs the Dense) unless
        # the fused LN+partition kernel already produced windowed tokens
        x = Attention(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            use_rel_pos=self.use_rel_pos,
            input_size=(
                self.input_size
                if self.window_size == 0
                else (self.window_size, self.window_size)
            ),
            lora_rank=self.lora_rank,
            dtype=self.dtype,
            fused=self.fused,
            window_size=self.window_size,
            pre_windowed=self.pre_windowed,
            windowed_input=use_lnw,
            windowed_output=use_upr,
            grid_hw=(pad_hw, hw) if use_lnw else self.grid_hw,
            name="attn",
        )(x)
        mlp = MLPBlock(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                       name="mlp")
        if use_upr:
            # attention honored windowed_output (every windowed_input
            # branch does): fuse exit unpartition + residual add + norm2
            # into one kernel pass
            ln2_scale, ln2_bias = _LNParams(self.dim, name="norm2")()
            x, y = unpartition_add_ln(
                x, shortcut, ln2_scale, ln2_bias, ws, interpret=interpret
            )
            return x + mlp(y)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        return x + mlp(y)


class _PatchEmbedMM(nn.Module):
    """Non-overlapping patch embed as reshape + ONE matmul — numerically the
    same contraction as the stride-16 conv (reference
    ``image_encoder.py:380-395``) but avoids XLA's convolution path, which
    at (16,16)/16 costs a {0,3,2,1} input layout copy plus a conv kernel at
    ~13 TF/s (~1.5 ms of the ViT-B/512 b8 step, docs/PERF.md). Parameters
    are declared with the conv's exact names/shapes (kernel (P,P,C,D) HWIO,
    bias (D,)) so checkpoints and torch imports are unchanged."""

    patch: int
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch
        b, h, w, c = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (p, p, c, self.dim)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        x = x.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // p, w // p, p * p * c)
        k = kernel.astype(self.dtype).reshape(p * p * c, self.dim)
        return x @ k + bias.astype(self.dtype)


class ImageEncoderViT(nn.Module):
    """(B, H, W, 3) → (B, H/16, W/16, out_chans) embeddings (``:17-116``)."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    qkv_bias: bool = True
    use_abs_pos: bool = True
    use_rel_pos: bool = False
    window_size: int = 0
    global_attn_indexes: Tuple[int, ...] = ()
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32
    fused: str = "auto"
    # keep consecutive windowed blocks in ONE shared partitioned layout
    # (partition once per run, re-zero pads per block) — numerically
    # identical for real tokens and removes ~half the partition copies,
    # BUT measured NEGATIVE on TPU at ViT-B/512 b8: the MLP/LN of every
    # block after the first in a run pay for 72% more (pad) tokens, which
    # costs more than the saved copies (fwd 190.4 vs 235.9 img/s, fwd+bwd
    # 70.4 vs 82.9 — docs/PERF.md §6). Default off; exact-parity tested.
    share_window_runs: bool = False
    fuse_ln_window: str = "auto"  # fused LN+partition kernel (see Block)
    fuse_unpart_residual: str = "never"  # fused exit kernel (measured neutral)
    patch_embed_mm: bool = True  # reshape+matmul patch embed (see _PatchEmbedMM)

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        if self.patch_embed_mm:
            x = _PatchEmbedMM(
                patch=self.patch_size, dim=self.embed_dim, dtype=self.dtype,
                name="patch_embed",
            )(x)
        else:
            x = nn.Conv(
                self.embed_dim,
                (self.patch_size, self.patch_size),
                strides=(self.patch_size, self.patch_size),
                padding="VALID",
                dtype=self.dtype,
                name="patch_embed",
            )(x)
        if self.use_abs_pos:
            side = self.img_size // self.patch_size
            pos = self.param(
                "pos_embed", nn.initializers.zeros, (1, side, side, self.embed_dim)
            )
            x = x + pos.astype(self.dtype)

        def make_block(i, pre_windowed=False, grid_hw=None):
            return Block(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                use_rel_pos=self.use_rel_pos,
                window_size=self.window_size if i not in self.global_attn_indexes else 0,
                input_size=(self.img_size // self.patch_size,) * 2,
                lora_rank=self.lora_rank,
                dtype=self.dtype,
                fused=self.fused,
                pre_windowed=pre_windowed,
                grid_hw=grid_hw,
                fuse_ln_window=self.fuse_ln_window,
                fuse_unpart_residual=self.fuse_unpart_residual,
                name=f"block{i}",
            )

        ws = self.window_size
        i = 0
        while i < self.depth:
            windowed = ws > 0 and i not in self.global_attn_indexes
            j = i
            while (
                self.share_window_runs
                and windowed
                and j < self.depth
                and j not in self.global_attn_indexes
            ):
                j += 1
            if windowed and j - i >= 2:
                # shared-partition run: one partition/unpartition for the
                # whole run of consecutive windowed blocks
                hw = (x.shape[1], x.shape[2])
                x, pad_hw = window_partition(x, ws)
                for k in range(i, j):
                    x = make_block(k, pre_windowed=True,
                                   grid_hw=(pad_hw, hw))(x)
                x = window_unpartition(x, ws, pad_hw, hw)
                i = j
            else:
                x = make_block(i)(x)
                i += 1

        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype, name="neck_conv1")(x)
        x = LayerNorm2d(dtype=self.dtype, name="neck_norm1")(x)
        x = nn.Conv(
            self.out_chans, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="neck_conv2"
        )(x)
        x = LayerNorm2d(dtype=self.dtype, name="neck_norm2")(x)
        return x
