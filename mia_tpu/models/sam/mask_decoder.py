"""SAM mask decoders (reference
``src/models/segment_anything/modeling/mask_decoder.py:16-174`` and the
CPC-SAM ``mask_decoder_prompt_large.py:16-180``).

``MaskDecoderPromptLarge`` uses a FOUR-stage upscaler (16× total → output at
image_size/4) and also returns ``dense_features`` (the upscaled embedding)
for the contrastive loss. Channel-last throughout; the hypernetwork product
is one einsum on the MXU.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..unet import EinsumConvTranspose2x
from .common import LayerNorm2d


class MLP(nn.Module):
    """Stacked Linear+ReLU head (``mask_decoder_prompt_large.py:159-180``)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class _Upscaler(nn.Module):
    """N-stage ConvTranspose upscaler. Plain SAM: 2 stages (4×); prompt-large:
    4 stages (16×, ``mask_decoder_prompt_large.py:53-65``).

    ``layout="tap"``: because every stage is k=2/s=2, no stage
    mixes spatial neighbours — the WHOLE chain is a per-input-pixel map.
    All stages therefore run at the embedding's 32×32 spatial size with a
    growing tap axis ((b, h, w, 4^s, f) tensors, full-lane layouts, fat
    GEMMs), and ONE final depth-to-space transpose materializes the
    (b, 2^s·h, 2^s·w, f) grid. Hypothesis: that removes the per-stage
    interleaved 6D stores + strided backward reads that dominate the
    phase-2 trace. MEASURED NEGATIVE (docs/PERF.md §27: phase-2 -31%,
    phase-1 -15%, AMG -4% — the one big depth-to-space transpose lowers
    worse than XLA's per-stage GEMM-epilogue interleave), so the default
    stays "interleave". Both paths produce identical values (same
    per-element contraction; equality pinned in tests/test_mask_decoder),
    share the same parameter tree, and load the same checkpoints."""

    transformer_dim: int
    stages: int
    dtype: jnp.dtype = jnp.float32
    layout: str = "interleave"  # "interleave" | "tap"

    @nn.compact
    def __call__(self, x):
        d = self.transformer_dim
        if self.stages == 2:
            plan = [(d // 4, "ln"), (d // 8, None)]
        else:
            plan = [(d // 4, "ln"), (d // 8, "ln"), (d // 16, "ln"), (d // 16, None)]
        tap = self.layout == "tap"
        if tap:
            x = x[:, :, :, None, :]  # (b, h, w, t=1, c)
        for i, (feats, norm) in enumerate(plan):
            # k=2/s=2 transposed conv as one GEMM (EinsumConvTranspose2x,
            # checkpoint-compatible with nn.ConvTranspose). Unlike the UNet
            # decoder — where this was a measured negative (unet.py) — the
            # SAM upscaler's THIN channel counts (64/32/16) leave the
            # strided-conv lowering ~10x off the HBM roofline
            # (80 GB/s, docs/PERF.md), and the GEMM path wins.
            x = EinsumConvTranspose2x(
                feats, dimension=2, dtype=self.dtype, name=f"up{i}",
            )(x)
            if norm == "ln":
                x = LayerNorm2d(dtype=self.dtype, name=f"norm{i}")(x)
            x = nn.gelu(x, approximate=False)
        if tap:
            # depth-to-space: tap index bits are (i1, j1, i2, j2, ...) with
            # stage 1 most significant; output row = Σ i_k·2^(s-k), col
            # likewise (out(2h+i) applied s times ⇒ row = 2^s·h + i1·2^(s-1)
            # + ... + i_s)
            s = self.stages
            b, h, w, t, f = x.shape
            x = x.reshape(b, h, w, *(2,) * (2 * s), f)
            perm = (
                [0, 1]
                + [3 + 2 * k for k in range(s)]
                + [2]
                + [4 + 2 * k for k in range(s)]
                + [3 + 2 * s]
            )
            x = x.transpose(perm)
            x = x.reshape(b, h << s, w << s, f)
        return x


class _DecoderCore(nn.Module):
    transformer_dim: int
    transformer: nn.Module
    num_multimask_outputs: int
    upscale_stages: int
    iou_head_depth: int
    iou_head_hidden_dim: int
    dtype: jnp.dtype = jnp.float32
    # hypernetwork mask product form. The einsum "btc,bhwc->bhwt" is a
    # K=C dot (C=16/32) lowered GEMM/conv-style; "elementwise" computes the
    # same contraction as a broadcast multiply + tiny-axis sum with no GEMM
    # layout preference; "auto" picks elementwise on TPU when C ≤ 32.
    # Default "einsum": the layout-fight hypothesis measured NEGATIVE on
    # the production surface — same-session A/B on the CPC-SAM phase
    # programs (docs/PERF.md §25) has elementwise at -2.9% phase-2
    # throughput (38.47 → 37.41 img/s, spreads ≤ 0.9%); phase-1 deltas sat
    # inside 10-14% window noise. Branch equality is pinned by
    # tests/test_mask_decoder.py on CPU (both branches forced explicitly).
    hyper_product: str = "einsum"  # "auto" | "einsum" | "elementwise"
    # upscaler lowering (see _Upscaler docstring + docs/PERF.md §27):
    # "tap" measured NEGATIVE (phase-2 -31%, phase-1 -15%, AMG -4%) —
    # XLA's fused per-stage interleave beats the one-big-transpose plan
    upscaler_layout: str = "interleave"  # "interleave" | "tap"

    def setup(self):
        self.num_mask_tokens = self.num_multimask_outputs + 1
        self.iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, self.transformer_dim)
        )
        self.mask_tokens = self.param(
            "mask_tokens",
            nn.initializers.normal(1.0),
            (self.num_mask_tokens, self.transformer_dim),
        )
        self.output_upscaling = _Upscaler(
            self.transformer_dim, self.upscale_stages, dtype=self.dtype,
            layout=self.upscaler_layout,
        )
        # hypernetwork output matches the upscaler's channel count:
        # dim//8 for the plain 2-stage decoder, dim//16 for prompt-large
        hyper_out = self.transformer_dim // (8 if self.upscale_stages == 2 else 16)
        self.output_hypernetworks_mlps = [
            MLP(self.transformer_dim, hyper_out, 3, dtype=self.dtype,
                name=f"hyper_mlp{i}")
            for i in range(self.num_mask_tokens)
        ]
        self.iou_prediction_head = MLP(
            self.iou_head_hidden_dim, self.num_mask_tokens, self.iou_head_depth,
            dtype=self.dtype, name="iou_head",
        )

    def predict(self, image_embeddings, image_pe, sparse_prompt, dense_prompt):
        """image_embeddings (B, H, W, C); returns (masks (B, h', w', T),
        iou_pred (B, T), dense_features (B, h', w', C'))."""
        bs = sparse_prompt.shape[0]
        output_tokens = jnp.concatenate([self.iou_token, self.mask_tokens], axis=0)
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (bs,) + output_tokens.shape
        )
        tokens = jnp.concatenate([output_tokens, sparse_prompt], axis=1)

        src = image_embeddings + dense_prompt
        b, h, w, c = src.shape
        pos_src = jnp.broadcast_to(image_pe, (b,) + image_pe.shape[1:])

        hs, src = self.transformer(src, pos_src, tokens)
        iou_token_out = hs[:, 0, :]
        mask_tokens_out = hs[:, 1 : 1 + self.num_mask_tokens, :]

        src = src.reshape(b, h, w, c)
        upscaled = self.output_upscaling(src)

        hyper_in = jnp.stack(
            [
                self.output_hypernetworks_mlps[i](mask_tokens_out[:, i, :])
                for i in range(self.num_mask_tokens)
            ],
            axis=1,
        )  # (B, T, C')
        bu, hu, wu, cu = upscaled.shape
        use_ew = self.hyper_product == "elementwise" or (
            self.hyper_product == "auto"
            and cu <= 32
            and jax.default_backend() == "tpu"
        )
        if use_ew:
            # same contraction, f32 accumulation, as a fusable broadcast
            # multiply + C-axis sum (C ≤ 32): the (B,H,W,T,C) intermediate
            # never materializes and no GEMM layout preference applies
            masks = jnp.sum(
                upscaled.astype(jnp.float32)[..., None, :]
                * hyper_in.astype(jnp.float32)[:, None, None],
                axis=-1,
            ).astype(self.dtype)
        else:
            masks = jnp.einsum(
                "btc,bhwc->bhwt", hyper_in, upscaled,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)

        iou_pred = self.iou_prediction_head(iou_token_out)
        return masks, iou_pred, upscaled


class MaskDecoder(nn.Module):
    """Plain SAM decoder: 2-stage upscaler, multimask slice selection
    (``mask_decoder.py:16-174``)."""

    transformer_dim: int
    transformer: nn.Module
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    hyper_product: str = "einsum"
    upscaler_layout: str = "interleave"

    def setup(self):
        self.core = _DecoderCore(
            transformer_dim=self.transformer_dim,
            transformer=self.transformer,
            num_multimask_outputs=self.num_multimask_outputs,
            upscale_stages=2,
            iou_head_depth=self.iou_head_depth,
            iou_head_hidden_dim=self.iou_head_hidden_dim,
            dtype=self.dtype,
            hyper_product=self.hyper_product,
            upscaler_layout=self.upscaler_layout,
        )

    def __call__(
        self,
        image_embeddings,
        image_pe,
        sparse_prompt_embeddings,
        dense_prompt_embeddings,
        multimask_output: bool,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        masks, iou_pred, _ = self.core.predict(
            image_embeddings, image_pe, sparse_prompt_embeddings, dense_prompt_embeddings
        )
        mask_slice = slice(1, None) if multimask_output else slice(0, 1)
        return masks[..., mask_slice], iou_pred[:, mask_slice]


class MaskDecoderPromptLarge(nn.Module):
    """CPC-SAM decoder: 4-stage upscaler + dense features
    (``mask_decoder_prompt_large.py:16-157``). Returns ALL mask tokens (the
    multi-decoder Sam slices them per class)."""

    transformer_dim: int
    transformer: nn.Module
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    hyper_product: str = "einsum"
    upscaler_layout: str = "interleave"

    def setup(self):
        self.core = _DecoderCore(
            transformer_dim=self.transformer_dim,
            transformer=self.transformer,
            num_multimask_outputs=self.num_multimask_outputs,
            upscale_stages=4,
            iou_head_depth=self.iou_head_depth,
            iou_head_hidden_dim=self.iou_head_hidden_dim,
            dtype=self.dtype,
            hyper_product=self.hyper_product,
            upscaler_layout=self.upscaler_layout,
        )

    def __call__(
        self,
        image_embeddings,
        image_pe,
        sparse_prompt_embeddings,
        dense_prompt_embeddings,
        multimask_output: bool = True,
    ):
        masks, iou_pred, dense_features = self.core.predict(
            image_embeddings, image_pe, sparse_prompt_embeddings, dense_prompt_embeddings
        )
        return masks, iou_pred, dense_features
