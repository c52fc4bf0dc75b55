"""Sam and the CPC-SAM multi-decoder Sam (reference
``src/models/segment_anything/modeling/sam.py`` and
``sam_dualmask_same_prompt_class_random_large.py``).

TPU-first redesign of the dual-mask forward: the reference's prompt
self-generation leaves the device every iteration (pseudo-label → numpy →
skimage/cv2 → back); here it is a jitted sub-program
(``prompt_generation.py``), so ``forward_train`` with any ``prompt_idx`` is
ONE XLA program. ``prompt_idx``/``prompt_mode`` are static trace arguments
(4 variants per training run).

Feature-set heads (projection/prediction/per-class selectors) use
masked batch statistics instead of torch BatchNorm1d over a
variable-length feature subset, keeping shapes static (SURVEY §7).

``forward_test`` (broken upstream: references nonexistent
``self.mask_decoder1``, ``:427``) is implemented with the intended
semantics: decoder 0 with the given prompts.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import resize
from .image_encoder import ImageEncoderViT
from .mask_decoder import MaskDecoder, MaskDecoderPromptLarge
from .prompt_encoder import PromptEncoder, PromptEncoderPromptClass
from .prompt_generation import prompt_generate_random_fast
from .transformer import TwoWayTransformer

PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)


def preprocess_image(x, img_size: int, pixel_mean=PIXEL_MEAN, pixel_std=PIXEL_STD):
    """Normalize and zero-pad (B, H, W, 3) to the encoder size
    (``sam_dualmask...py:482-493``)."""
    mean = jnp.asarray(pixel_mean, jnp.float32)
    std = jnp.asarray(pixel_std, jnp.float32)
    x = (x.astype(jnp.float32) - mean) / std
    h, w = x.shape[1], x.shape[2]
    return jnp.pad(x, ((0, 0), (0, img_size - h), (0, img_size - w), (0, 0)))


def build_image_encoder(model) -> ImageEncoderViT:
    """Standalone ``ImageEncoderViT`` identical to the one ``model``
    (:class:`Sam` or :class:`SamDualmask`) constructs in ``setup()`` — for
    code that needs the encoder *module* outside ``apply`` (the
    tensor-parallel forward, ``mia_tpu.parallel.tp``, reads its static
    fields to build the per-shard program)."""
    return ImageEncoderViT(
        img_size=model.img_size,
        patch_size=16,
        embed_dim=model.encoder_embed_dim,
        depth=model.encoder_depth,
        num_heads=model.encoder_num_heads,
        out_chans=256,
        use_rel_pos=True,
        window_size=14,
        global_attn_indexes=model.encoder_global_attn_indexes,
        lora_rank=model.lora_rank,
        dtype=model.dtype,
    )


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over a masked feature set: statistics from valid rows
    only. Stands in for torch BN1d on variable-length subsets."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None):
        if mask is None:
            mean = jnp.mean(x, axis=0)
            var = jnp.var(x, axis=0)
        else:
            m = mask.astype(jnp.float32)[:, None]
            count = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, axis=0) / count
            var = jnp.sum(jnp.square(x - mean) * m, axis=0) / count
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class FeatureHead(nn.Module):
    """Linear → BN → act → Linear head (projection / prediction / selector,
    ``sam_dualmask...py:81-114``)."""

    hidden: int
    out: int
    act: str = "relu"

    @nn.compact
    def __call__(self, x, mask=None):
        x = nn.Dense(self.hidden, name="lin1")(x)
        x = MaskedBatchNorm(self.hidden, name="bn")(x, mask)
        if self.act == "relu":
            x = nn.relu(x)
        else:
            x = nn.leaky_relu(x, negative_slope=0.2)
        return nn.Dense(self.out, name="lin2")(x)


class Sam(nn.Module):
    """Plain single-decoder SAM (``sam.py:18-209``)."""

    img_size: int = 512
    num_classes: int = 3
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    encoder_global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32
    mask_threshold: float = 0.0

    def setup(self):
        embed_dim = 256
        patch = 16
        self.image_encoder = build_image_encoder(self)
        size = self.img_size // patch
        self.prompt_encoder = PromptEncoder(
            embed_dim=embed_dim,
            image_embedding_size=(size, size),
            input_image_size=(self.img_size, self.img_size),
            mask_in_chans=16,
        )
        self.mask_decoder = MaskDecoder(
            transformer_dim=embed_dim,
            transformer=TwoWayTransformer(
                depth=2, embedding_dim=embed_dim, num_heads=8, mlp_dim=2048,
                dtype=self.dtype,
            ),
            num_multimask_outputs=self.num_classes,
            dtype=self.dtype,
        )

    def __call__(self, batched_input, multimask_output=True, image_size=None):
        return self.forward_train(batched_input, multimask_output, image_size)

    def get_image_embeddings(self, batched_input):
        return self.image_encoder(preprocess_image(batched_input, self.img_size))

    def forward_train(self, batched_input, multimask_output, image_size):
        image_embeddings = self.get_image_embeddings(batched_input)
        sparse, dense = self.prompt_encoder()
        low_res_masks, iou_predictions = self.mask_decoder(
            image_embeddings,
            self.prompt_encoder.get_dense_pe(),
            sparse,
            dense,
            multimask_output,
        )
        masks = postprocess_masks(
            low_res_masks, self.img_size, (image_size, image_size), (image_size, image_size)
        )
        return {
            "masks": masks,
            "iou_predictions": iou_predictions,
            "low_res_logits": low_res_masks,
        }


def postprocess_masks(masks, encoder_size: int, input_size, original_size):
    """Upscale decoder masks to encoder size, strip padding, resize to the
    original size (``sam_dualmask...py:449-481``). Channel-last."""
    masks = resize(masks, (encoder_size, encoder_size), "bilinear", antialias=False)
    masks = masks[:, : input_size[0], : input_size[1]]
    return resize(masks, tuple(original_size), "bilinear", antialias=False)


class SamDualmask(nn.Module):
    """Multi-decoder CPC-SAM (``sam_dualmask...py:35-338``)."""

    img_size: int = 512
    num_classes: int = 3
    num_decoders: int = 3
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    encoder_global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    dropout_rate: float = 0.0
    num_points_prompt: Tuple[int, int] = (1, 2)
    bbox_change_rate: Tuple[float, float] = (0.1, 0.2)
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32
    mask_threshold: float = 0.0
    # run the unprompted multi-decoder passes as ONE vmapped program over
    # stacked decoder params (False = the reference-shaped Python loop,
    # kept for equality tests)
    use_stacked_decoders: bool = True

    def setup(self):
        embed_dim = 256
        patch = 16
        self.image_encoder = build_image_encoder(self)
        size = self.img_size // patch
        self.embedding_size = size
        self.prompt_encoder = PromptEncoderPromptClass(
            embed_dim=embed_dim,
            image_embedding_size=(size, size),
            input_image_size=(self.img_size, self.img_size),
            mask_in_chans=16,
        )
        self.mask_decoders = [
            MaskDecoderPromptLarge(
                transformer_dim=embed_dim,
                transformer=TwoWayTransformer(
                    depth=2, embedding_dim=embed_dim, num_heads=8, mlp_dim=2048,
                    dtype=self.dtype,
                ),
                num_multimask_outputs=self.num_classes,
                dtype=self.dtype,
                name=f"mask_decoder{i}",
            )
            for i in range(self.num_decoders)
        ]

        dim_in = 256 // 16
        feat_dim = dim_in * 2
        num_tokens = self.num_classes + 1
        self.projection_head = FeatureHead(feat_dim, feat_dim, "relu", name="projection_head")
        self.prediction_head = FeatureHead(feat_dim, feat_dim, "relu", name="prediction_head")
        self.class_selectors = [
            FeatureHead(feat_dim, 1, "leaky", name=f"contrastive_class_selector_{c}")
            for c in range(num_tokens)
        ]
        self.class_selectors_memory = [
            FeatureHead(feat_dim, 1, "leaky", name=f"contrastive_class_selector_memory{c}")
            for c in range(num_tokens)
        ]

    def init_variables(self, x, image_size):
        """Init-only trace that exercises EVERY parameter path: a prompted
        forward (point+box+mask) plus the contrastive heads (flax creates
        params only on traced paths)."""
        out = self.forward_train(x, True, image_size, 0, ["all"], train=True)
        feat_dim = 256 // 16  # dense-feature channels (transformer_dim // 16)
        proj = self.projection_head(jnp.zeros((4, feat_dim)), None)
        pred = self.prediction_head(proj, None)
        for c in range(self.num_classes + 1):
            self.class_selectors[c](pred, None)
            self.class_selectors_memory[c](pred, None)
        return out

    # -- heads (used by the contrastive loss / memory) -------------------
    def project_features(self, features, mask=None):
        return self.projection_head(features, mask)

    def predict_features(self, features, mask=None):
        return self.prediction_head(features, mask)

    def select_features(self, c: int, features, mask=None, memory: bool = False):
        heads = self.class_selectors_memory if memory else self.class_selectors
        return heads[c](features, mask)

    def get_image_embeddings(self, batched_input):
        return self.image_encoder(preprocess_image(batched_input, self.img_size))

    def _run_decoder(self, idx, image_embeddings, sparse, dense, multimask_output):
        return self.mask_decoders[idx](
            image_embeddings,
            self.prompt_encoder.get_dense_pe(),
            sparse,
            dense,
            multimask_output,
        )

    def _run_decoders_stacked(
        self, indices, image_embeddings, sparse, dense, multimask_output
    ):
        """ONE vmapped decoder pass over the stacked params of the decoders
        in ``indices`` (static) instead of a Python loop of separate passes
        (the reference loops, ``sam_dualmask...py:271-307``). The decoders
        are architecturally identical, so their param trees stack along a
        leading axis and a detached template module (``parent=None``) vmaps
        over it — the token-thin two-way transformer and the 4-stage
        upscaler then run as len(indices)×-batched MXU ops in one schedule
        slot. Returns (logits, iou, feats) each with leading axis
        ``len(indices)``. Param trees stay per-decoder (``mask_decoder{i}``)
        in checkpoints; stacking is per-call and free at HBM bandwidth."""
        template = MaskDecoderPromptLarge(
            transformer_dim=256,
            transformer=TwoWayTransformer(
                depth=2, embedding_dim=256, num_heads=8, mlp_dim=2048,
                dtype=self.dtype, parent=None,
            ),
            num_multimask_outputs=self.num_classes,
            dtype=self.dtype,
            parent=None,
        )
        trees = [self.mask_decoders[i].variables["params"] for i in indices]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
        pe = self.prompt_encoder.get_dense_pe()
        return jax.vmap(
            lambda p: template.apply(
                {"params": p}, image_embeddings, pe, sparse, dense, multimask_output
            )
        )(stacked)

    def _unprompted_all(self, image_embeddings, sparse, dense, multimask_output,
                        indices=None):
        """All (or ``indices``) decoders unprompted → per-decoder lists.
        Uses the stacked vmap pass unless initializing (params must be
        created decoder-by-decoder) or ``use_stacked_decoders=False``
        (the loop path kept for equality tests)."""
        indices = list(range(self.num_decoders)) if indices is None else list(indices)
        if self.is_initializing() or not self.use_stacked_decoders:
            outs = [
                self._run_decoder(i, image_embeddings, sparse, dense, multimask_output)
                for i in indices
            ]
            return (
                [o[0] for o in outs],
                [o[1] for o in outs],
                [o[2] for o in outs],
            )
        logits, iou, feats = self._run_decoders_stacked(
            indices, image_embeddings, sparse, dense, multimask_output
        )
        k = len(indices)
        return (
            [logits[i] for i in range(k)],
            [iou[i] for i in range(k)],
            [feats[i] for i in range(k)],
        )

    def raw_decoder_softmaxes(self, image_embeddings, multimask_output=True):
        """Stop-gradient softmaxes of every decoder's UNPROMPTED no-dropout
        logits, stacked (n, B, H, W, C) — the shared ingredients of the
        per-``prompt_idx`` pseudo-label ensembles (mean over the other
        decoders), so the CPC-SAM phase-2 trainer can batch all three
        decoders' prompt generations into ONE program."""
        sparse, dense = self.prompt_encoder()
        sparse = jax.lax.stop_gradient(sparse)
        dense = jax.lax.stop_gradient(dense)
        logits_list, _, _ = self._unprompted_all(
            jax.lax.stop_gradient(image_embeddings), sparse, dense, multimask_output
        )
        return jnp.stack(
            [
                jax.nn.softmax(
                    jax.lax.stop_gradient(lrl).astype(jnp.float32), axis=-1
                )
                for lrl in logits_list
            ]
        )

    def __call__(
        self,
        batched_input,
        multimask_output=True,
        image_size=None,
        prompt_idx: int = -1,
        prompt_mode=None,
        image_embeddings=None,
        train: bool = False,
        prompts=None,
    ):
        return self.forward_train(
            batched_input,
            multimask_output,
            image_size,
            prompt_idx,
            prompt_mode,
            image_embeddings,
            train=train,
            prompts=prompts,
        )

    def forward_train(
        self,
        batched_input,
        multimask_output,
        image_size,
        prompt_idx: int = -1,
        prompt_mode=None,
        image_embeddings=None,
        train: bool = False,
        prompts=None,
    ):
        """``prompt_idx``/``prompt_mode`` STATIC. With ``prompt_idx >= 0``
        the other decoders run unprompted, their softmax ensemble becomes the
        pseudo-label for prompt generation, and decoder ``prompt_idx`` runs
        twice (center/fit vs random/loose prompts) (``:216-338``).

        ``prompts`` injects precomputed prompt tensors (the 5-tuple returned
        by ``prompt_generate_random_fast``), skipping the in-call ensemble +
        generation — used by the trainer's batched phase-2 path and by
        parity harnesses that need fixed prompts."""
        if image_embeddings is None:
            image_embeddings = self.get_image_embeddings(batched_input)

        if prompt_idx >= 0 and prompt_mode is not None:
            # reference cycles the prompt list by prompt_idx (":229-231")
            modes = list(prompt_mode) if isinstance(prompt_mode, (list, tuple)) else [prompt_mode]
            prompt = modes[prompt_idx % len(modes)]
        else:
            prompt = None

        sparse, dense = self.prompt_encoder()
        if prompt_idx >= 0:
            sparse = jax.lax.stop_gradient(sparse)
            dense = jax.lax.stop_gradient(dense)

        if self.dropout_rate > 0 and train:
            drop_rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(
                drop_rng,
                1.0 - self.dropout_rate,
                image_embeddings.shape[:1] + (1, 1) + image_embeddings.shape[-1:],
            )
            dropout_embeddings = (
                image_embeddings * keep / (1.0 - self.dropout_rate)
            )
        else:
            dropout_embeddings = image_embeddings

        n = self.num_decoders
        low_res_logits = [None] * n
        iou_predictions = [None] * n
        dense_features = [None] * n
        low_res_logits_r = [None] * n
        iou_predictions_r = [None] * n
        dense_features_r = [None] * n

        need_assemble = 0 <= prompt_idx < n and prompts is None
        indices = [i for i in range(n) if i != prompt_idx]
        if self.use_stacked_decoders and not self.is_initializing():
            # run the FULL n-decoder stack even when one decoder is the
            # prompted one: every per-``prompt_idx`` call then runs the
            # IDENTICAL stacked pass (same params, same inputs), which XLA
            # CSEs to ONE pass across the trainer's three phase-2
            # sub-forwards — stacking only the (n−1)-subsets made each call
            # a distinct un-CSE-able program and measured 18% slower
            # (docs/PERF.md §20)
            lrls, ious, feats = self._unprompted_all(
                dropout_embeddings, sparse, dense, multimask_output
            )
            picked = [(lrls[i], ious[i], feats[i]) for i in indices]
        else:
            picked = list(
                zip(
                    *self._unprompted_all(
                        dropout_embeddings, sparse, dense, multimask_output,
                        indices,
                    )
                )
            )
        for k, idx in enumerate(indices):
            low_res_logits[idx], iou_predictions[idx], dense_features[idx] = picked[k]
        assemble = 0.0
        if need_assemble:
            if self.dropout_rate > 0 and train:
                raw_lrls, _, _ = self._unprompted_all(
                    image_embeddings, sparse, dense, multimask_output, indices
                )
            else:
                raw_lrls = [low_res_logits[i] for i in indices]
            for raw in raw_lrls:
                assemble = assemble + jax.nn.softmax(
                    jax.lax.stop_gradient(raw).astype(jnp.float32), axis=-1
                )
        assemble = assemble / (n - 1)

        if 0 <= prompt_idx < n:
            if prompts is not None:
                (
                    points_prompt,
                    points_prompt_random,
                    fit_boxes,
                    loose_boxes,
                    mask_prompt,
                ) = prompts
            else:
                prompt_rng = self.make_rng("prompt")
                (
                    points_prompt,
                    points_prompt_random,
                    fit_boxes,
                    loose_boxes,
                    mask_prompt,
                ) = prompt_generate_random_fast(
                    prompt_rng,
                    assemble,
                    image_size,
                    (self.embedding_size * 4, self.embedding_size * 4),
                    self.num_points_prompt,
                    self.bbox_change_rate,
                    israndom=True,
                )
            sparse_p, sparse_r, dense_p = self._get_prompt_embeddings(
                points_prompt, points_prompt_random, fit_boxes, loose_boxes,
                mask_prompt, prompt,
            )
            # the center/fit and random/loose variants run the SAME decoder
            # on the SAME image embeddings and dense prompt — one 2B-batched
            # pass instead of two sequential ones (identical math; the
            # reference runs them back-to-back, ``:320-338``). The token-side
            # ops of the two-way transformer are ~13 tokens wide and
            # latency-bound on TPU, so halving the pass count is free
            # throughput.
            bsz = sparse_p.shape[0]
            lrl2, iou2, feats2 = self._run_decoder(
                prompt_idx,
                jnp.concatenate([dropout_embeddings, dropout_embeddings], 0),
                jnp.concatenate([sparse_p, sparse_r], 0),
                jnp.concatenate([dense_p, dense_p], 0),
                multimask_output,
            )
            low_res_logits[prompt_idx] = lrl2[:bsz]
            iou_predictions[prompt_idx] = iou2[:bsz]
            dense_features[prompt_idx] = feats2[:bsz]
            low_res_logits_r[prompt_idx] = lrl2[bsz:]
            iou_predictions_r[prompt_idx] = iou2[bsz:]
            dense_features_r[prompt_idx] = feats2[bsz:]

        masks = [
            postprocess_masks(
                lrl, self.img_size, (image_size, image_size), (image_size, image_size)
            )
            if lrl is not None
            else None
            for lrl in low_res_logits
        ]

        return {
            "masks": masks,
            "iou_predictions": iou_predictions,
            "low_res_logits": low_res_logits,
            "low_res_logits_r": low_res_logits_r,
            "dense_features": dense_features,
            "dense_features_r": dense_features_r,
        }

    def _get_prompt_embeddings(
        self, points, points_random, fit_boxes, loose_boxes, mask_prompt, prompt
    ):
        """Prompt-mode dispatch (``:146-211``)."""
        pe = self.prompt_encoder
        if prompt == "point":
            sparse, dense = pe(points=points)
            sparse_r, _ = pe(points=points_random)
        elif prompt == "box":
            sparse, dense = pe(boxes=fit_boxes)
            sparse_r, _ = pe(boxes=loose_boxes)
        elif prompt == "mask":
            sparse, dense = pe(masks=mask_prompt)
            sparse_r = sparse
        elif prompt == "point-box":
            sparse, dense = pe(points=points, boxes=fit_boxes)
            sparse_r, _ = pe(points=points_random, boxes=loose_boxes)
        elif prompt == "point-mask":
            sparse, dense = pe(points=points, masks=mask_prompt)
            sparse_r, _ = pe(points=points_random)
        elif prompt == "box-mask":
            sparse, dense = pe(boxes=fit_boxes, masks=mask_prompt)
            sparse_r, _ = pe(boxes=loose_boxes)
        elif prompt == "all":
            sparse, dense = pe(points=points, boxes=fit_boxes, masks=mask_prompt)
            sparse_r, _ = pe(
                points=points_random, boxes=loose_boxes, masks=mask_prompt
            )
        else:
            sparse, dense = pe()
            sparse_r = sparse
        return sparse, sparse_r, dense

    def forward_test(self, image, multimask_output=True, points=None, boxes=None, masks=None):
        """Intended semantics of the broken upstream ``forward_test``
        (``:427`` references ``self.mask_decoder1``): decoder 0 with the
        given prompts; returns thresholded masks."""
        image_embeddings = self.get_image_embeddings(image)
        sparse, dense = self.prompt_encoder(points=points, boxes=boxes, masks=masks)
        low_res_masks, iou_predictions, _ = self._run_decoder(
            0, image_embeddings, sparse, dense, multimask_output
        )
        h, w = image.shape[1], image.shape[2]
        out_masks = postprocess_masks(low_res_masks, self.img_size, (h, w), (h, w))
        return {
            "masks": out_masks > self.mask_threshold,
            "iou_predictions": iou_predictions,
            "low_res_logits": low_res_masks,
        }
