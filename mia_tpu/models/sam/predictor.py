"""Interactive SAM predictor (reference
``src/models/segment_anything/predictor.py:17-268``): embed an image once,
then predict masks for any prompts. The embedding and the prompt→mask pass
are two cached jitted programs; prompt counts are padded to fixed slots so
repeated clicks never recompile.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .sam import Sam, postprocess_masks
from .transforms import ResizeLongestSide


class SamPredictor:
    def __init__(
        self,
        sam_model: Sam,
        variables,
        max_points: int = 16,
        exact_prompts: bool = False,
    ):
        """``exact_prompts=False`` (default) pads point prompts to
        ``max_points`` slots (label −1) so repeated clicks never recompile —
        a TPU-friendly deviation: pad tokens still participate in the
        two-way transformer's softmax, so outputs differ slightly from the
        reference's exact token count (see PARITY.md). ``True`` sizes the
        token count exactly like the reference (``predictor.py:129-143``)
        at the cost of one compile per distinct prompt count."""
        self.model = sam_model
        self.variables = variables
        self.transform = ResizeLongestSide(sam_model.img_size)
        self.max_points = max_points
        self.exact_prompts = exact_prompts
        # jitted programs: one encoder embed (recompiles per input size —
        # the longest side is fixed, so at most a handful), and one
        # prompt→mask program per (has_box, has_mask, multimask) combo
        self._embed_program = jax.jit(
            lambda v, x: sam_model.apply(
                v, x, method=sam_model.get_image_embeddings
            )
        )
        self._decoder_programs: dict = {}
        self.reset_image()

    def _decoder_program(
        self, has_box: bool, has_mask: bool, multimask: bool,
        has_points: bool = True,
    ):
        key = (has_box, has_mask, multimask, has_points)
        if key not in self._decoder_programs:
            model = self.model

            def run(variables, features, coords, labels, boxes, masks_in):
                def apply_fn(mdl):
                    sparse, dense = mdl.prompt_encoder(
                        points=(coords, labels) if has_points else None,
                        boxes=boxes if has_box else None,
                        masks=masks_in if has_mask else None,
                    )
                    return mdl.mask_decoder(
                        features,
                        mdl.prompt_encoder.get_dense_pe(),
                        sparse,
                        dense,
                        multimask,
                    )

                return model.apply(variables, method=apply_fn)

            self._decoder_programs[key] = jax.jit(run)
        return self._decoder_programs[key]

    def reset_image(self):
        self.is_image_set = False
        self.features = None
        self.original_size = None
        self.input_size = None

    def set_image(self, image: np.ndarray, image_format: str = "RGB"):
        """(H, W, 3) uint8 → cached embeddings (``predictor.py:34-91``)."""
        if image_format == "BGR":
            image = image[..., ::-1]
        self.original_size = image.shape[:2]
        resized = self.transform.apply_image(image)
        self.input_size = resized.shape[:2]
        # get_image_embeddings normalizes + pads to the encoder square
        self.features = self._embed_program(
            self.variables, jnp.asarray(resized, jnp.float32)[None]
        )
        self.is_image_set = True

    def predict(
        self,
        point_coords: np.ndarray | None = None,
        point_labels: np.ndarray | None = None,
        box: np.ndarray | None = None,
        mask_input: np.ndarray | None = None,
        multimask_output: bool = True,
        return_logits: bool = False,
    ):
        """Prompts in original-image coordinates → (masks, iou, low-res)
        (``predictor.py:92-168``). Unless ``exact_prompts``, points are
        padded to ``max_points`` slots (label −1 = inactive) so prompt
        counts never retrigger compilation. Thin batch-of-one wrapper over
        :meth:`predict_batch`.
        """
        if mask_input is not None:
            m = np.asarray(mask_input, np.float32)
            if m.ndim == 2:
                m = m[None, ..., None]
            elif m.ndim == 3:
                # (h, w, 1) or (1, h, w) → (1, h, w, 1)
                m = m[None] if m.shape[-1] == 1 else m[..., None]
            mask_input = m
        masks, iou, low_res = self.predict_batch(
            point_coords=(
                np.asarray(point_coords, np.float32)[None]
                if point_coords is not None
                else None
            ),
            point_labels=(
                np.asarray(point_labels)[None] if point_labels is not None else None
            ),
            boxes=(
                np.asarray(box, np.float32).reshape(1, 4)
                if box is not None
                else None
            ),
            mask_input=mask_input,
            multimask_output=multimask_output,
            return_logits=return_logits,
        )
        return masks[0], iou[0], low_res[0]

    def predict_batch(
        self,
        point_coords: np.ndarray | None = None,
        point_labels: np.ndarray | None = None,
        boxes: np.ndarray | None = None,
        mask_input: np.ndarray | None = None,
        multimask_output: bool = True,
        return_logits: bool = False,
    ):
        """Batched prompts against the cached embedding — the reference's
        ``predict_torch`` surface (``predictor.py:169-254``): ``(N, P, 2)``
        coords / ``(N, P)`` labels, ``(N, 4)`` boxes and ``(N, h, w, 1)``
        mask inputs in original-image coordinates → ``(N, M, H, W)`` masks,
        ``(N, M)`` iou, ``(N, M, h, w)`` low-res, all N prompts in ONE
        device program. The decoder broadcasts the batch-1 image embedding
        against the N-batch prompts, so no per-prompt embed copies are
        made."""
        if not self.is_image_set:
            raise RuntimeError("An image must be set with .set_image(...) first")
        if point_coords is not None:
            pts = self.transform.apply_coords(
                np.asarray(point_coords, np.float32), self.original_size
            )
            n, p = pts.shape[:2]
        else:
            pts = None
            n = len(boxes) if boxes is not None else len(mask_input)
            p = 0
        slots = p if self.exact_prompts else max(self.max_points, p)
        coords = np.zeros((n, max(slots, 1), 2), np.float32)
        labels = -np.ones((n, max(slots, 1)), np.int32)
        if pts is not None:
            coords[:, :p] = pts
            labels[:, :p] = np.asarray(point_labels)

        boxes_j = None
        if boxes is not None:
            boxes_j = jnp.asarray(
                self.transform.apply_boxes(np.asarray(boxes), self.original_size),
                jnp.float32,
            )
        masks_j = None
        if mask_input is not None:
            m = np.asarray(mask_input, np.float32)
            if m.ndim == 3:
                m = m[..., None]
            masks_j = jnp.asarray(m)

        program = self._decoder_program(
            boxes_j is not None,
            masks_j is not None,
            bool(multimask_output),
            has_points=not (self.exact_prompts and p == 0),
        )
        e4 = 4 * (self.model.img_size // 16)
        low_res_masks, iou_predictions = program(
            self.variables,
            self.features,
            jnp.asarray(coords),
            jnp.asarray(labels),
            boxes_j if boxes_j is not None else jnp.zeros((n, 4), jnp.float32),
            masks_j
            if masks_j is not None
            else jnp.zeros((n, e4, e4, 1), jnp.float32),
        )
        masks = postprocess_masks(
            low_res_masks, self.model.img_size, self.input_size, self.original_size
        )
        masks = np.asarray(masks)
        if not return_logits:
            masks = masks > self.model.mask_threshold
        return (
            np.moveaxis(masks, -1, 1),
            np.asarray(iou_predictions),
            np.moveaxis(np.asarray(low_res_masks), -1, 1),
        )

    def get_image_embedding(self):
        if not self.is_image_set:
            raise RuntimeError("An image must be set with .set_image(...) first")
        return self.features
