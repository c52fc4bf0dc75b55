"""Interactive SAM predictor (reference
``src/models/segment_anything/predictor.py:17-268``): embed an image once,
then predict masks for any prompts.

Serving-path design (docs/PERF.md §19): the interactive loop is
latency-bound by host↔device transfers, not device FLOPs (the ViT-B/512
embed is ~3 ms on a v5e chip), so every stage is engineered to minimise
round trips and wire bytes:

- ``set_image`` ships the RAW uint8 image (4x fewer bytes than f32) and
  runs resize + quantize + normalize + pad + encoder as ONE device
  program; nothing is fetched back — the embedding stays on device.
- ``predict`` runs prompt-encode + decode + upscale + threshold +
  bit-packing as ONE device program; the wire carries packed mask bits
  (1/32nd of f32 logits) and float16 low-res logits (lossless at the
  reference's comparison tolerance, see PARITY.md), unpacked host-side.
- Results are pulled with ``copy_to_host_async`` + an ``is_ready`` spin
  instead of a blocking read: through a remote-TPU tunnel the blocking
  primitive adds ~5 ms of sync overhead per call on top of the true
  arrival time (measured in docs/PERF.md §19).

Prompt counts are padded to fixed slots so repeated clicks never
recompile.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from ...ops import resize
from .sam import Sam, postprocess_masks
from .transforms import ResizeLongestSide


def fetch_async(arrays):
    """Pull device arrays to host: start all copies, spin on ``is_ready``
    (non-blocking, ~4 us/check), then read the landed buffers. Equivalent
    to ``jax.device_get`` but avoids the blocking primitive's sync
    overhead through the TPU tunnel (docs/PERF.md §19)."""
    for a in arrays:
        a.copy_to_host_async()
    while not all(a.is_ready() for a in arrays):
        time.sleep(2e-4)
    return [np.asarray(a) for a in arrays]


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
        # jitted programs: one fused resize+quantize+embed per input image
        # shape (the longest side is fixed, so at most a handful), and one
        # prompt→mask program per (prompt combo, sizes) key
        self._embed_programs: dict = {}
        self._decoder_programs: dict = {}
        # device-resident zero placeholders for absent box/mask prompts,
        # cached per shape: through a remote-TPU tunnel every extra
        # per-call array creation adds a pipeline stage ahead of the
        # result's arrival (docs/PERF.md §19)
        self._zeros_cache: dict = {}
        self.reset_image()

    def _zeros(self, shape):
        if shape not in self._zeros_cache:
            self._zeros_cache[shape] = jnp.zeros(shape, jnp.float32)
        return self._zeros_cache[shape]

    def _embed_program(self, image_shape):
        """uint8 (H, W, 3) on device → embeddings, fused: f32 cast,
        antialiased bilinear resize to the long-side target, uint8
        quantization (parity with the reference's PIL resize wire format,
        ``predictor.py:34-50``), SAM normalize + pad + ViT encoder."""
        if image_shape not in self._embed_programs:
            model = self.model
            h, w = image_shape
            input_size = ResizeLongestSide.get_preprocess_shape(
                h, w, model.img_size
            )

            def run(variables, img_u8):
                x = img_u8.astype(jnp.float32)
                x = resize(x, input_size, "bilinear", antialias=True)
                # float→uint8 truncation matches the host apply_image path
                x = x.astype(jnp.uint8).astype(jnp.float32)
                return model.apply(
                    variables, x[None], method=model.get_image_embeddings
                )

            self._embed_programs[image_shape] = jax.jit(run)
        return self._embed_programs[image_shape]

    def _decoder_program(
        self, has_box: bool, has_mask: bool, multimask: bool,
        has_points: bool, return_logits: bool,
        input_size, original_size,
    ):
        """ONE program: prompt encoder + decoder + upscale-to-original +
        (unless ``return_logits``) threshold + bit-pack. The reference
        post-processes and thresholds on host per call
        (``predictor.py:144-168``); fusing it keeps the wire payload at
        packed bits + f16 low-res instead of two f32 mask stacks."""
        key = (
            has_box, has_mask, multimask, has_points, return_logits,
            tuple(input_size), tuple(original_size),
        )
        if key not in self._decoder_programs:
            model = self.model

            def run(variables, features, packed_pts, boxes, masks_in):
                # coords+labels ride as ONE (N, P, 3) f32 upload (labels are
                # small ints — exact in f32); one H2D instead of two
                coords = packed_pts[..., :2]
                labels = packed_pts[..., 2].astype(jnp.int32)

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

                low_res, iou = model.apply(variables, method=apply_fn)
                masks = postprocess_masks(
                    low_res, model.img_size, input_size, original_size
                )  # (N, H, W, M) logits, channel-last
                masks = jnp.moveaxis(masks, -1, 1)  # (N, M, H, W)
                low_res_w = jnp.moveaxis(low_res, -1, 1).astype(jnp.float16)
                if return_logits:
                    return masks.astype(jnp.float32), iou, low_res_w
                packed = jnp.packbits(
                    (masks > model.mask_threshold).reshape(-1)
                )
                return packed, iou, low_res_w

            self._decoder_programs[key] = jax.jit(run)
        return self._decoder_programs[key]

    def reset_image(self):
        self.is_image_set = False
        self.features = None
        self.original_size = None
        self.input_size = None

    def set_image(self, image: np.ndarray, image_format: str = "RGB"):
        """(H, W, 3) uint8 → cached embeddings (``predictor.py:34-91``).
        Asynchronous: the uint8 image is shipped and the fused
        resize+embed program dispatched; nothing blocks on the result
        (``predict`` consumes the embedding on device)."""
        if image_format == "BGR":
            image = image[..., ::-1]
        self.original_size = image.shape[:2]
        self.input_size = ResizeLongestSide.get_preprocess_shape(
            *self.original_size, self.model.img_size
        )
        img_dev = jax.device_put(np.ascontiguousarray(image, dtype=np.uint8))
        self.features = self._embed_program(self.original_size)(
            self.variables, img_dev
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
        packed_pts = np.zeros((n, max(slots, 1), 3), np.float32)
        packed_pts[..., 2] = -1.0
        if pts is not None:
            packed_pts[:, :p, :2] = pts
            packed_pts[:, :p, 2] = np.asarray(point_labels)

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
            not (self.exact_prompts and p == 0),
            bool(return_logits),
            self.input_size,
            self.original_size,
        )
        e4 = 4 * (self.model.img_size // 16)
        masks_w, iou_w, low_res_w = program(
            self.variables,
            self.features,
            jax.device_put(packed_pts),
            boxes_j if boxes_j is not None else self._zeros((n, 4)),
            masks_j if masks_j is not None else self._zeros((n, e4, e4, 1)),
        )
        masks_host, iou, low_res = fetch_async([masks_w, iou_w, low_res_w])
        m = iou.shape[1]
        oh, ow = self.original_size
        if return_logits:
            masks = masks_host
        else:
            masks = (
                np.unpackbits(masks_host, count=n * m * oh * ow)
                .reshape(n, m, oh, ow)
                .astype(bool)
            )
        return masks, iou, low_res.astype(np.float32)

    def get_image_embedding(self):
        if not self.is_image_set:
            raise RuntimeError("An image must be set with .set_image(...) first")
        return self.features
    # docs/PERF.md §19 records the measured latency decomposition of this
    # path through the TPU tunnel (arrival floor ≈ one relay round trip).
