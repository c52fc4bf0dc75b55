"""Automatic mask generation utilities + generator (reference
``src/models/segment_anything/utils/amg.py`` and
``automatic_mask_generator.py`` — upstream SAM code, unused by the
trainers but part of the API surface).

numpy/JAX re-implementation: MaskData container, uncompressed RLE codec,
stability score, point grids, batched mask→box, and a grid-prompted
``SamAutomaticMaskGenerator`` with IoU/stability filtering and greedy
box NMS.
"""

from __future__ import annotations

from typing import Any, Generator, ItemsView, List

import numpy as np

import jax.numpy as jnp


class MaskData:
    """Dict-of-arrays container with filter/cat (``amg.py:16-76``)."""

    def __init__(self, **kwargs):
        for v in kwargs.values():
            assert isinstance(v, (list, np.ndarray)), "MaskData only supports list/ndarray"
        self._stats = dict(**kwargs)

    def __setitem__(self, key, item):
        self._stats[key] = item

    def __delitem__(self, key):
        del self._stats[key]

    def __getitem__(self, key):
        return self._stats[key]

    def items(self) -> ItemsView[str, Any]:
        return self._stats.items()

    def filter(self, keep: np.ndarray):
        for k, v in self._stats.items():
            if v is None:
                continue
            if isinstance(v, np.ndarray):
                self._stats[k] = v[keep]
            elif isinstance(v, list):
                idx = np.flatnonzero(keep) if keep.dtype == bool else keep
                self._stats[k] = [v[i] for i in idx]

    def cat(self, new_stats: "MaskData"):
        for k, v in new_stats.items():
            if k not in self._stats or self._stats[k] is None:
                self._stats[k] = v
            elif isinstance(v, np.ndarray):
                self._stats[k] = np.concatenate([self._stats[k], v], axis=0)
            elif isinstance(v, list):
                self._stats[k] = self._stats[k] + list(v)


def batch_iterator(batch_size: int, *args) -> Generator[List[Any], None, None]:
    assert len(args) > 0 and all(len(a) == len(args[0]) for a in args)
    n_batches = len(args[0]) // batch_size + int(len(args[0]) % batch_size != 0)
    for b in range(n_batches):
        yield [arg[b * batch_size : (b + 1) * batch_size] for arg in args]


def mask_to_rle(mask: np.ndarray) -> dict:
    """Uncompressed RLE, column-major like the upstream (``amg.py:107-135``)."""
    h, w = mask.shape
    flat = np.asarray(mask, bool).transpose(1, 0).reshape(-1)
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    idx = np.concatenate([[0], change, [len(flat)]])
    counts = [] if not flat[0] else [0]
    counts.extend(np.diff(idx).tolist())
    return {"size": [h, w], "counts": counts}


def rle_to_mask(rle: dict) -> np.ndarray:
    h, w = rle["size"]
    mask = np.empty(h * w, dtype=bool)
    idx = 0
    parity = False
    for count in rle["counts"]:
        mask[idx : idx + count] = parity
        idx += count
        parity = not parity
    return mask.reshape(w, h).transpose()


def area_from_rle(rle: dict) -> int:
    return sum(rle["counts"][1::2])


def calculate_stability_score(
    masks: jnp.ndarray, mask_threshold: float, threshold_offset: float
) -> jnp.ndarray:
    """IoU of the high- and low-threshold binarizations (``amg.py:156-176``)."""
    axes = tuple(range(masks.ndim - 2, masks.ndim))
    intersections = jnp.sum(masks > (mask_threshold + threshold_offset), axis=axes)
    unions = jnp.sum(masks > (mask_threshold - threshold_offset), axis=axes)
    return intersections / jnp.maximum(unions, 1)


def build_point_grid(n_per_side: int) -> np.ndarray:
    offset = 1 / (2 * n_per_side)
    points_one_side = np.linspace(offset, 1 - offset, n_per_side)
    points_x = np.tile(points_one_side[None, :], (n_per_side, 1))
    points_y = np.tile(points_one_side[:, None], (1, n_per_side))
    return np.stack([points_x, points_y], axis=-1).reshape(-1, 2)


def build_all_layer_point_grids(n_per_side, n_layers, scale_per_layer):
    return [
        build_point_grid(int(n_per_side / (scale_per_layer**i)))
        for i in range(n_layers + 1)
    ]


def batched_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """(…, H, W) bool → XYXY boxes; zeros for empty masks (``amg.py:303-346``)."""
    masks = np.asarray(masks, bool)
    shape = masks.shape
    h, w = shape[-2:]
    flat = masks.reshape(-1, h, w)
    rows = flat.any(axis=2)  # (N, H)
    cols = flat.any(axis=1)  # (N, W)
    top = rows.argmax(axis=1)
    bottom = h - 1 - rows[:, ::-1].argmax(axis=1)
    left = cols.argmax(axis=1)
    right = w - 1 - cols[:, ::-1].argmax(axis=1)
    boxes = np.stack([left, top, right, bottom], axis=1).astype(np.int64)
    boxes[~rows.any(axis=1)] = 0  # empty masks → zero box
    return boxes.reshape(*shape[:-2], 4)


def box_xyxy_to_xywh(box_xyxy: np.ndarray) -> np.ndarray:
    box = np.asarray(box_xyxy).copy()
    box[..., 2] = box[..., 2] - box[..., 0]
    box[..., 3] = box[..., 3] - box[..., 1]
    return box


def remove_small_regions(mask: np.ndarray, area_thresh: float, mode: str):
    """Remove small islands/holes (``amg.py:267-291``; cv2 → scipy)."""
    assert mode in ("holes", "islands")
    from scipy import ndimage

    correct_holes = mode == "holes"
    working = (correct_holes ^ mask).astype(np.uint8)
    labels, n = ndimage.label(working, structure=np.ones((3, 3)))
    sizes = ndimage.sum(working, labels, range(1, n + 1))
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask, False
    fill = np.isin(labels, small)
    mask = mask.copy()
    mask[fill] = correct_holes
    return mask, True


def _box_nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float) -> np.ndarray:
    """Greedy NMS over XYXY boxes → kept indices."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(area_i + areas - inter, 1e-9)
        suppressed |= iou > iou_threshold
        suppressed[i] = True
    return np.asarray(keep, np.int64)


class SamAutomaticMaskGenerator:
    """Grid-prompted AMG (``automatic_mask_generator.py:35-372``), single
    crop layer: point grid → batched predictor → IoU/stability filter →
    box NMS → records with RLE segmentation."""

    def __init__(
        self,
        predictor,
        points_per_side: int = 32,
        points_per_batch: int = 64,
        pred_iou_thresh: float = 0.88,
        stability_score_thresh: float = 0.95,
        stability_score_offset: float = 1.0,
        box_nms_thresh: float = 0.7,
        min_mask_region_area: int = 0,
    ):
        self.predictor = predictor
        self.point_grids = build_point_grid(points_per_side)
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.min_mask_region_area = min_mask_region_area
        self._programs: dict = {}

    def _grid_program(self, input_size, original_size):
        """One jitted program per (input, original) size pair: N point
        prompts → prompt-encode → decode → upscale → stability, with the
        mask THRESHOLDING and BIT-PACKING on device, so nothing heavier
        than two (N, M) score vectors crosses the wire per chunk — the
        packed (N·M, ceil(HW/8)) mask rows stay ON DEVICE until the host
        has filtered by iou/stability and only the survivors are gathered
        (``_gather_program``). The reference fetches full-resolution f32
        logits for EVERY grid point per batch
        (``automatic_mask_generator.py:276-283``)."""
        import jax

        from .sam import postprocess_masks

        key = (tuple(input_size), tuple(original_size))
        if key not in self._programs:
            model = self.predictor.model
            thr = model.mask_threshold
            off = self.stability_score_offset

            def run(variables, features, coords, labels):
                def apply_fn(mdl):
                    sparse, dense = mdl.prompt_encoder(
                        points=(coords, labels), boxes=None, masks=None
                    )
                    return mdl.mask_decoder(
                        features,
                        mdl.prompt_encoder.get_dense_pe(),
                        sparse,
                        dense,
                        True,
                    )

                low_res, iou = model.apply(variables, method=apply_fn)
                masks = postprocess_masks(
                    low_res, model.img_size, input_size, original_size
                )  # (N, H, W, M) logits, channel-last
                inter = jnp.sum(masks > (thr + off), axis=(1, 2))
                union = jnp.sum(masks > (thr - off), axis=(1, 2))
                stability = inter / jnp.maximum(union, 1)  # (N, M)
                n, h, w, m = masks.shape
                packed = jnp.packbits(
                    jnp.moveaxis(masks > thr, -1, 1).reshape(n * m, h * w),
                    axis=-1,
                )  # (N·M, ceil(HW/8)) uint8, point-major rows
                return packed, iou, stability

            self._programs[key] = jax.jit(run)
        return self._programs[key]

    def _gather_program(self, k_pad: int):
        """Gather ``k_pad`` surviving packed-mask rows from the stacked
        per-chunk outputs (keyed by the padded survivor count, bucketed by
        the caller so compiles stay bounded)."""
        import jax

        key = ("gather", k_pad)
        if key not in self._programs:

            def run(stacked_rows, idx):
                return jnp.take(stacked_rows, idx, axis=0)

            self._programs[key] = jax.jit(run)
        return self._programs[key]

    def generate(self, image: np.ndarray) -> list[dict]:
        import jax

        from .predictor import fetch_async

        self.predictor.set_image(image)
        h, w = image.shape[:2]
        points = self.point_grids * np.array([w, h])

        pred = self.predictor
        program = self._grid_program(pred.input_size, pred.original_size)
        # one real point per prompt: exact_prompts predictors size tokens
        # like the reference; the default pads to max_points slots
        slots = 1 if getattr(pred, "exact_prompts", False) else max(pred.max_points, 1)

        # phase 1 — dispatch EVERY chunk back-to-back (device pipelines the
        # decodes); only the two (N, M) score vectors come back per chunk,
        # the packed mask rows stay on device
        chunk_rows, chunk_scores, chunk_ns = [], [], []
        for (batch_points,) in batch_iterator(self.points_per_batch, points):
            # all chunk's points in ONE device program; the short final
            # chunk is padded (repeat last point) so every chunk reuses the
            # same compiled shape
            n = len(batch_points)
            pts = np.asarray(batch_points, np.float32)
            if n < self.points_per_batch:
                pts = np.concatenate(
                    [pts, np.repeat(pts[-1:], self.points_per_batch - n, 0)]
                )
            coords = np.zeros((len(pts), slots, 2), np.float32)
            labels = -np.ones((len(pts), slots), np.int32)
            coords[:, 0] = pred.transform.apply_coords(pts, pred.original_size)
            labels[:, 0] = 1
            packed_b, iou_b, stab_b = program(
                pred.variables,
                pred.features,
                jnp.asarray(coords),
                jnp.asarray(labels),
            )
            chunk_rows.append(packed_b)
            chunk_scores.extend([iou_b, stab_b])
            chunk_ns.append(n)

        scores = fetch_async(chunk_scores)
        keep_flat, iou_keep = [], []
        m = scores[0].shape[1]
        rows_per_chunk = self.points_per_batch * m
        for ci, n in enumerate(chunk_ns):
            iou_b, stab_b = scores[2 * ci][:n], scores[2 * ci + 1][:n]
            keep = (iou_b > self.pred_iou_thresh) & (
                stab_b > self.stability_score_thresh
            )  # (n, M); row-major flatten = the point-major order the
            # per-point loop produced
            pi, mi = np.nonzero(keep)
            keep_flat.append(ci * rows_per_chunk + pi * m + mi)
            iou_keep.append(iou_b[keep])
        keep_flat = np.concatenate(keep_flat) if keep_flat else np.zeros(0, np.int64)
        iou_preds = (
            np.concatenate(iou_keep) if iou_keep else np.zeros(0, np.float32)
        )

        if len(keep_flat) == 0:
            return []

        # phase 2 — gather ONLY the survivors' packed rows (bucketed pad so
        # survivor counts don't retrigger compiles), one D2H for all masks
        k = len(keep_flat)
        k_pad = max(32, 1 << (k - 1).bit_length())
        idx = np.zeros(k_pad, np.int32)
        idx[:k] = keep_flat
        stacked = jnp.concatenate(chunk_rows, axis=0)
        packed_keep = self._gather_program(k_pad)(stacked, jnp.asarray(idx))
        (packed_host,) = fetch_async([packed_keep])
        masks_keep = (
            np.unpackbits(packed_host, axis=-1, count=h * w)[:k]
            .reshape(k, h, w)
            .astype(bool)
        )
        data = MaskData(masks=masks_keep, iou_preds=iou_preds)

        boxes = batched_mask_to_box(data["masks"])
        keep = _box_nms(boxes.astype(float), data["iou_preds"], self.box_nms_thresh)
        data.filter(keep)
        boxes = boxes[keep]

        records = []
        for i in range(len(data["masks"])):
            mask = data["masks"][i]
            if self.min_mask_region_area > 0:
                mask, _ = remove_small_regions(mask, self.min_mask_region_area, "islands")
                mask, _ = remove_small_regions(mask, self.min_mask_region_area, "holes")
            rle = mask_to_rle(mask)
            records.append(
                {
                    "segmentation": mask,
                    "rle": rle,
                    "area": int(mask.sum()),
                    "bbox": box_xyxy_to_xywh(boxes[i]).tolist(),
                    "predicted_iou": float(data["iou_preds"][i]),
                }
            )
        return records
