"""Configurable 2D/3D UNet in Flax (NHWC / NDHWC).

Behavioral parity with the reference UNet (``src/models/unet/unet.py``,
``src/models/unet/blocks.py``): 5-ish levels x 2 conv blocks, stride-2
downsampling from level 1, ConvTranspose(k2,s2) upsampling with skip-concat,
1x1 seg head, optional deep-supervision heads, plain or residual blocks,
batch or instance norm (eps 1e-5, affine), LeakyReLU(0.01), channel dropout.

TPU-first choices: channel-last layout so convolutions tile directly onto
the MXU, a `compute_dtype` knob for bfloat16 activations with float32
parameters, and pure-functional feature extraction endpoints
(``enc_feature`` = bottleneck GAP for coreset/kmeans selectors, reference
``unet.py:87-91``; ``pixel_feature`` = pre-head decoder features,
``unet.py:224-244``).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    dimension: int = 2
    in_channels: int = 1
    out_classes: int = 4
    channels_list: tuple[int, ...] = (32, 64, 128, 256, 512)
    block_type: str = "plain"  # "plain" | "res"
    normalization: str = "batch"  # "batch" | "instance"
    dropout_prob: float | None = 0.1
    deep_supervision: bool = False
    ds_layer: int = 0
    kernel_size: int = 3
    compute_dtype: jnp.dtype = jnp.float32
    # route convs through ops/conv.py::FusedBiasConv (barrier-materialized
    # backward cotangent). Measured NEGATIVE on TPU — device busy 120.6 ms
    # vs 114.9 ms stock at the flagship shape (docs/PERF.md §7) — so the
    # default is the stock nn.Conv path; the knob and its parity tests
    # remain as the documented attempt.
    fused_bias_grad: bool = False
    # decoder upsampling as one wide GEMM + interleave reshape instead of
    # lax.conv_transpose (see EinsumConvTranspose2x). Measured NEGATIVE on
    # TPU (device busy 122.0 vs 114.9 ms at the flagship shape — the
    # interleave materializes as 6.9 ms of data-formatting copies, more
    # than the 3.1 ms of `reverse` it removes; docs/PERF.md §7), so the
    # default stays on the stock ConvTranspose lowering.
    einsum_upsample: bool = False

    @property
    def num_levels(self) -> int:
        return len(self.channels_list)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over spatial dims.

    torch ``InstanceNorm2d(affine=True, track_running_stats=False)``:
    biased variance, instance statistics at train *and* eval.
    """

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        spatial_axes = tuple(range(1, x.ndim - 1))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=spatial_axes, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=spatial_axes, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = y * scale + bias
        return y.astype(self.dtype)


def _norm(cfg: UNetConfig, features: int, train: bool, name: str = "norm"):
    if cfg.normalization == "instance":
        return InstanceNorm(features=features, dtype=cfg.compute_dtype, name=name)
    if cfg.normalization == "batch":
        # torch BatchNorm2d: eps 1e-5, momentum 0.1 (flax momentum = 0.9)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=cfg.compute_dtype,
            name=name,
        )
    raise ValueError(f"unknown normalization: {cfg.normalization}")


def _leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=0.01)


def _conv(cfg: UNetConfig, features: int, kernel: int, stride: int, name=None):
    nd = cfg.dimension
    pad = (kernel - 1) // 2
    if cfg.fused_bias_grad:
        from ..ops.conv import FusedBiasConv

        return FusedBiasConv(
            features=features,
            kernel_size=(kernel,) * nd,
            strides=(stride,) * nd,
            padding=((pad, pad),) * nd,
            dtype=cfg.compute_dtype,
            name=name,
        )
    return nn.Conv(
        features=features,
        kernel_size=(kernel,) * nd,
        strides=(stride,) * nd,
        padding=((pad, pad),) * nd,
        use_bias=True,
        dtype=cfg.compute_dtype,
        name=name,
    )


class PlainBlock(nn.Module):
    """conv -> channel dropout -> norm -> LeakyReLU (reference ``blocks.py:66-105``)."""

    cfg: UNetConfig
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = _conv(self.cfg, self.features, self.cfg.kernel_size, self.stride, name="conv")(x)
        if self.cfg.dropout_prob:
            spatial = tuple(range(1, x.ndim - 1))
            x = nn.Dropout(
                rate=self.cfg.dropout_prob,
                broadcast_dims=spatial,
                deterministic=not train,
            )(x)
        x = _norm(self.cfg, self.features, train)(x)
        return _leaky_relu(x)


class ResidualBlock(nn.Module):
    """conv -> norm -> dropout -> LeakyReLU, plus 1x1+norm skip when the
    shape changes; skip added *after* the nonlinearity (reference
    ``blocks.py:108-164``)."""

    cfg: UNetConfig
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        in_features = x.shape[-1]
        out = _conv(self.cfg, self.features, self.cfg.kernel_size, self.stride, name="conv")(x)
        out = _norm(self.cfg, self.features, train)(out)
        if self.cfg.dropout_prob:
            spatial = tuple(range(1, out.ndim - 1))
            out = nn.Dropout(
                rate=self.cfg.dropout_prob,
                broadcast_dims=spatial,
                deterministic=not train,
            )(out)
        out = _leaky_relu(out)

        if in_features != self.features or self.stride != 1:
            skip = _conv(self.cfg, self.features, 1, self.stride, name="skip_conv")(x)
            skip = _norm(self.cfg, self.features, train, name="skip_norm")(skip)
        else:
            skip = x
        return skip + out


def _block(cfg: UNetConfig):
    return {"plain": PlainBlock, "res": ResidualBlock}[cfg.block_type]


class EinsumConvTranspose2x(nn.Module):
    """Drop-in for ``nn.ConvTranspose(kernel_size=(2,)*nd, strides=(2,)*nd,
    padding='VALID')`` — identical param names/shapes (checkpoint
    compatible) and identical math up to f32 accumulation order.

    A k=2, s=2 transposed conv assigns each output pixel exactly ONE kernel
    tap: ``y[b, 2i+di, 2j+dj, f] = sum_c x[b,i,j,c] · K[1-di, 1-dj, c, f]``
    (tap indices reversed by the fractional-stride construction), so the
    whole op is one GEMM of shape (B·H·W, C) × (C, 2^nd·F) plus an
    interleave reshape. The hope was (a) full MXU output lanes where the
    strided-conv lowering gets only F (F=32 at the flagship top level →
    25% lane use) and (b) no full-activation ``reverse`` ops in the
    backward. Measured NEGATIVE at the flagship shape (docs/PERF.md §7):
    the interleave reshape materializes as 6.9 ms of data-formatting
    copies — more than the 3.1 ms of reverses it removes — so
    ``UNetConfig.einsum_upsample`` defaults to False and this stays as the
    documented attempt (exact-parity tested, 2D+3D, fwd+grads).
    Reference counterpart: ``nn.ConvTranspose2d(k=2, s=2)`` in
    ``src/models/unet/unet.py`` (decoder ``up`` stages).
    """

    features: int
    dimension: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # "always": use the Pallas interleave-free kernel (ops/upsample2x.py).
    # Default OFF: in-context on the CPC-SAM phase programs the kernel is a
    # measured 32-45% REGRESSION (docs/PERF.md §21) — its per-row-band grid
    # runs thin (W, Cin)x(Cin, Cout) GEMMs the MXU can't fill, while XLA's
    # einsum lowering batches the whole contraction as one large GEMM and
    # pays only the interleave copy. Kept for the equality test.
    use_pallas: str = "never"
    # 2D only: emit the two output-row taps as TWO GEMMs (each output
    # (B,H,W,2F) row-major) interleaved by a row-granular stack instead of
    # ONE GEMM whose (b,h,w,i,j,f)→(b,h,i,w,j,f) transpose copies
    # (j·F)-element chunks. Identical math per output element (same K-order
    # contraction; equality pinned vs nn.ConvTranspose in tests/test_unet).
    # Default False: the r5 same-session A/B (docs/PERF.md §25) measured
    # True at -3.4% CPC-SAM phase-2 throughput (38.73 → 37.41 img/s,
    # spreads ≤ 2.3%) and NEUTRAL on the UNet AL step (1055.7 vs 1054.5
    # img/s, drift bound 1053.5) — the single-GEMM interleave transpose is
    # not the cost the hypothesis assumed.
    pair_rows: bool = False

    @nn.compact
    def __call__(self, x):
        nd = self.dimension
        tap_space = x.ndim == nd + 3  # (b, h, w, t, c): see _Upscaler "tap"
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*(2,) * nd, x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        # reverse every tap axis; emit tap dims interleaved with spatial dims
        # directly from the einsum so the final reshape is a free dim-merge
        # (row-major (b,h,i,w,j,f) == (b,2h,2w,f))
        w = kernel[(slice(None, None, -1),) * nd]
        if tap_space:
            # k2s2 taps never mix spatial neighbours, so the stage can run
            # entirely in "tap space": each input (h, w, t) cell maps to 4
            # independent output taps. One fat GEMM (M = B·H·W·T, K = C,
            # N = 4F) with contiguous reads/writes — no interleaved 6D
            # store and no strided cotangent reads in the backward (the
            # docs/PERF.md §27 phase-2 bucket). The caller interleaves
            # ONCE at the end of the whole stage chain. Same per-element
            # contraction (same wrev, same K order) as the 4D path.
            assert nd == 2, "tap-space path is 2D-only"
            b, h, ww, t, c = x.shape
            y = jnp.einsum("bhwtc,ijcf->bhwtijf", x, w)
            return y.reshape(b, h, ww, 4 * t, self.features) + bias
        if nd == 2 and self.use_pallas == "always":
            from ..ops.upsample2x import conv_transpose2x_p, upsample2x_available

            interpret = jax.default_backend() != "tpu"
            if upsample2x_available(
                x.shape[1], x.shape[2], x.shape[3], self.features, interpret
            ):
                return conv_transpose2x_p(
                    x, w, bias.astype(jnp.float32), interpret
                )
        if nd == 2:
            b, h, ww, c = x.shape
            if self.pair_rows:
                # one GEMM per output-row tap; interleave rows by stack
                y = jnp.stack(
                    [jnp.einsum("bhwc,jcf->bhwjf", x, w[0]),
                     jnp.einsum("bhwc,jcf->bhwjf", x, w[1])],
                    axis=2,
                )  # (b, h, 2, w, 2, f) == row-major (b, 2h, 2w, f)
            else:
                y = jnp.einsum("bhwc,ijcf->bhiwjf", x, w)
            y = y.reshape(b, 2 * h, 2 * ww, self.features)
        else:
            b, d, h, ww, c = x.shape
            y = jnp.einsum("bdhwc,ijkcf->bdihjwkf", x, w)
            y = y.reshape(b, 2 * d, 2 * h, 2 * ww, self.features)
        return y + bias


class UNetEncoder(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, train: bool):
        cfg = self.cfg
        block = _block(cfg)
        skips = []
        for level, features in enumerate(cfg.channels_list):
            stride = 1 if level == 0 else 2
            x = block(cfg, features, stride, name=f"level{level}_block0")(x, train)
            x = block(cfg, features, 1, name=f"level{level}_block1")(x, train)
            skips.append(x)
        return skips


class UNetDecoder(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, skips: Sequence[jnp.ndarray], train: bool,
                 return_ds: bool = False, return_feature: bool = False):
        cfg = self.cfg
        nd = cfg.dimension
        block = _block(cfg)
        down_channels = cfg.channels_list[::-1]  # bottleneck first
        num_upsample = len(down_channels) - 1

        ds_layer_list = []
        if cfg.deep_supervision and cfg.ds_layer > 1:
            ds_layer_list = list(range(num_upsample - cfg.ds_layer, num_upsample - 1))

        x = skips[-1]
        ds_outputs, ds_feats = [], []
        for l in range(num_upsample):
            features = down_channels[l + 1]
            if cfg.einsum_upsample:
                x = EinsumConvTranspose2x(
                    features=features,
                    dimension=nd,
                    dtype=cfg.compute_dtype,
                    name=f"up{l}",
                )(x)
            else:
                x = nn.ConvTranspose(
                    features=features,
                    kernel_size=(2,) * nd,
                    strides=(2,) * nd,
                    padding="VALID",
                    dtype=cfg.compute_dtype,
                    name=f"up{l}",
                )(x)
            skip = skips[-(l + 2)]
            # reference concatenates (skip, upsampled) on the channel axis
            x = jnp.concatenate([skip, x], axis=-1)
            x = block(cfg, features, 1, name=f"level{l}_block0")(x, train)
            x = block(cfg, features, 1, name=f"level{l}_block1")(x, train)

            if l in ds_layer_list:
                # Params must exist regardless of return_ds, so the head is
                # always constructed; XLA dead-code-eliminates unused outputs.
                ds = _conv(cfg, cfg.out_classes, 1, 1, name=f"ds{l}_conv")(x)
                if return_ds:
                    up_factor = features // down_channels[-1]
                    from ..ops import resize

                    target = tuple(s * up_factor for s in ds.shape[1:-1])
                    ds = resize(ds, target, "bilinear", antialias=False)
                    ds_outputs.append(ds)
                    ds_feats.append(x)

        logits = _conv(cfg, cfg.out_classes, 1, 1, name="seg_output")(x)

        if return_ds:
            outs = [logits] + ds_outputs[::-1]
            if return_feature:
                return outs, [x] + ds_feats[::-1]
            return outs
        if return_feature:
            return logits, x
        return logits


class UNet(nn.Module):
    """Full UNet. ``__call__`` returns logits ``(B, ..., out_classes)``.

    Extraction endpoints (use ``model.apply(vars, x, method=...)``):
    - ``enc_feature``: bottleneck global-average-pool features ``(B, C)``
    - ``pixel_feature``: (logits, pre-head decoder features)
    """

    cfg: UNetConfig

    def setup(self):
        self.encoder = UNetEncoder(self.cfg)
        self.decoder = UNetDecoder(self.cfg)

    def __call__(self, x, train: bool = False, return_ds: bool = False):
        x = x.astype(self.cfg.compute_dtype)
        skips = self.encoder(x, train)
        return self.decoder(skips, train, return_ds=return_ds)

    def enc_feature(self, x, train: bool = False):
        x = x.astype(self.cfg.compute_dtype)
        skips = self.encoder(x, train)
        bottleneck = skips[-1]
        spatial = tuple(range(1, bottleneck.ndim - 1))
        return jnp.mean(bottleneck, axis=spatial)

    def pixel_feature(self, x, train: bool = False, return_ds: bool = False):
        x = x.astype(self.cfg.compute_dtype)
        skips = self.encoder(x, train)
        return self.decoder(skips, train, return_ds=return_ds, return_feature=True)

