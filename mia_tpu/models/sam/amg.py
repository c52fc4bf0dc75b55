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
    boxes = np.zeros((flat.shape[0], 4), np.int64)
    for i, m in enumerate(flat):
        if not m.any():
            continue
        rows = np.flatnonzero(m.any(axis=1))
        cols = np.flatnonzero(m.any(axis=0))
        boxes[i] = [cols[0], rows[0], cols[-1], rows[-1]]
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

    def generate(self, image: np.ndarray) -> list[dict]:
        self.predictor.set_image(image)
        h, w = image.shape[:2]
        points = self.point_grids * np.array([w, h])

        data = MaskData(masks=np.zeros((0, h, w), bool), iou_preds=np.zeros(0))
        for (batch_points,) in batch_iterator(self.points_per_batch, points):
            for point in batch_points:
                masks, iou_preds, low_res = self.predictor.predict(
                    point_coords=point[None],
                    point_labels=np.array([1]),
                    multimask_output=True,
                    return_logits=True,
                )
                stability = np.asarray(
                    calculate_stability_score(
                        jnp.asarray(masks),
                        self.predictor.model.mask_threshold,
                        self.stability_score_offset,
                    )
                )
                keep = (iou_preds > self.pred_iou_thresh) & (
                    stability > self.stability_score_thresh
                )
                if keep.any():
                    data.cat(
                        MaskData(
                            masks=masks[keep] > self.predictor.model.mask_threshold,
                            iou_preds=iou_preds[keep],
                        )
                    )

        if len(data["masks"]) == 0:
            return []

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
