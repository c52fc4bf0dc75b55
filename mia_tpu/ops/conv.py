"""Convolution with an explicitly materialized backward cotangent.

A measured-NEGATIVE optimization attempt, kept for the record (docs/PERF.md
§7): the flagship UNet train step spends ~7 ms (3 × 2.34 ms loop fusions at
689 GB/s) re-reading the upstream gradient chain just to reduce each conv's
bias gradient, because XLA keeps ``dy`` as a fused producer inside all three
backward consumers (bwd-data conv, bwd-filter conv, bias reduction). This
module materializes ``dy`` ONCE behind an ``optimization_barrier`` so the
bias reduction becomes a cheap re-read of an existing buffer.

Device-trace verdict (TPU v5e tunnel, batch 128 / 256² flagship step): the
barrier costs MORE than it saves — total busy 120.6 ms vs 114.9 ms stock —
because the materialization re-introduces the very 1.6 GB write+reads it
tried to elide (the standalone bias reductions already ran at HBM speed,
689 GB/s). An earlier ones-channel variant (bias grad riding the bwd-filter
conv via a constant-one input channel; ``_safe_tap`` picks the padding-free
tap it reads) lost the same way — XLA materialized the channel concat.
``UNetConfig.fused_bias_grad`` therefore defaults to False; the module
stays as the documented attempt with full gradient-parity tests.

Semantics: identical to ``flax.linen.Conv`` (same parameter names/shapes/
init, same dtype promotion), gradients equal up to f32 accumulation order.
Reference counterpart: plain ``nn.Conv2d`` uses inside the UNet blocks
(``src/models/unet/blocks.py:66-105``).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


def _dim_numbers(nd: int):
    if nd == 2:
        return ("NHWC", "HWIO", "NHWC")
    if nd == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    raise ValueError(f"unsupported spatial rank {nd}")


def _conv(x, w, strides, padding):
    nd = len(strides)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding=padding,
        dimension_numbers=_dim_numbers(nd),
    )


def _safe_tap(kernel_size, strides, padding, spatial_in):
    """Per spatial dim, a filter tap that reads only in-bounds input for
    every output position (so the ones-channel gradient at that tap is an
    exact, padding-free ``sum(dy)``). Returns None if any dim lacks one."""
    taps = []
    for k, s, (lo, hi), n in zip(kernel_size, strides, padding, spatial_in):
        n_out = (n + lo + hi - k) // s + 1
        tap = None
        for i in range(k):
            first = 0 * s + i - lo
            last = (n_out - 1) * s + i - lo
            if first >= 0 and last <= n - 1:
                tap = i
                break
        if tap is None:
            return None
        taps.append(tap)
    return tuple(taps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv_bias(x, w, b, strides, padding):
    """``conv(x, w) + b`` with a barrier-materialized backward cotangent."""
    return _conv(x, w, strides, padding) + b


def _conv_bias_fwd(x, w, b, strides, padding):
    return conv_bias(x, w, b, strides, padding), (x, w)


def _conv_bias_bwd(strides, padding, res, dy):
    x, w = res
    # Materialize the incoming cotangent ONCE. Without the barrier XLA
    # re-fuses the (lrelu-bwd -> BN-bwd -> dropout-bwd) producer chain into
    # each of the three consumers (bwd-data conv, bwd-filter conv, bias
    # reduction), re-reading ~3x the bytes and stalling the conv pipelines
    # on VPU recompute (docs/PERF.md §7).
    (dy,) = lax.optimization_barrier((dy,))
    _, vjp_x = jax.vjp(lambda x_: _conv(x_, w, strides, padding), x)
    (dx,) = vjp_x(dy)
    _, vjp_w = jax.vjp(lambda w_: _conv(x, w_, strides, padding), w)
    (dw,) = vjp_w(dy)
    db = jnp.sum(dy, axis=tuple(range(dy.ndim - 1)), dtype=dy.dtype)
    return dx, dw, db


conv_bias.defvjp(_conv_bias_fwd, _conv_bias_bwd)


class FusedBiasConv(nn.Module):
    """Drop-in for ``nn.Conv(use_bias=True)`` (same params: ``kernel`` of
    shape ``(*kernel_size, Cin, Cout)`` + ``bias``) whose backward emits the
    bias gradient from the filter-gradient conv pass instead of a standalone
    reduction. Checkpoint- and init-compatible with ``nn.Conv``."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    padding: Sequence[tuple[int, int]]
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        return conv_bias(
            x, kernel, bias, tuple(self.strides), tuple(self.padding)
        )
