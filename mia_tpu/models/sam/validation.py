"""Volume evaluation for (multi-decoder) SAM (reference
``src/models/segment_anything/validation.py:29-79, 424-516``).

A volume becomes one batched slice-stack forward (the reference's own
batching trick), decoder softmaxes are ensembled on device, and the
per-class (dice, hd95) / (dice, hd, asd, jc) metrics run as jitted programs
(``mia_tpu.metrics``). NIfTI I/O (raw-case spacing reads, prediction
volume dumps, ``validation.py:468-493``) runs on the dependency-free codec
in ``mia_tpu.utils.nifti``; prediction/overlay PNG dumps match the
reference layout.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from PIL import Image

import functools

from ...metrics.metrics import metric_percase, metric_percase_hd95
from ...ops.resize import resize as device_resize
from ...utils.common import draw_mask

# jitted metric programs (cached per (classes, mask shape)): ALL classes of a
# case run in ONE device program (stacked like the AL trainer's
# ``metrics_volume``) instead of one dispatch per class per case.
@functools.lru_cache(maxsize=8)
def _stacked_metric_programs(classes: int):
    @jax.jit
    def hd95_all(pred, label):
        return jnp.stack(
            [
                jnp.stack(metric_percase_hd95(pred == i, label == i))
                for i in range(1, classes)
            ]
        )

    @jax.jit
    def full_all(pred, label, spacing):
        return jnp.stack(
            [
                jnp.stack(metric_percase(pred == i, label == i, spacing))
                for i in range(1, classes)
            ]
        )

    return hd95_all, full_all


@functools.lru_cache(maxsize=64)
def _volume_resize_programs(in_hw, patch_hw):
    """Cached jitted (volume→patch bilinear-antialias, argmax→native
    nearest-exact) resize programs per shape pair — replaces the former
    per-slice PIL host loops (``nearest_exact`` matches PIL NEAREST for
    downscale and up to boundary floats elsewhere)."""

    @jax.jit
    def to_patch(stack):
        return device_resize(stack, patch_hw, "bilinear", antialias=True)

    @jax.jit
    def back_to_native(pred):
        return device_resize(
            pred[..., None].astype(jnp.int32), in_hw, "nearest_exact"
        )[..., 0]

    @jax.jit
    def labels_to_patch(labels):
        return device_resize(
            labels[..., None].astype(jnp.int32), patch_hw, "nearest_exact"
        )[..., 0]

    return to_patch, back_to_native, labels_to_patch


def _as_decoder_list(masks):
    """Dual-mask models return a LIST of per-decoder mask tensors; plain
    ``Sam`` returns one (D, H, W, C) array — iterating that would sum
    softmaxes across depth slices. Normalize to a list."""
    if isinstance(masks, (list, tuple)):
        return masks
    return [masks]


def _depth_bucket(d: int, multiple: int = 1) -> int:
    """Round the slice count up to a bucket so the heavy jitted model
    forward compiles once per BUCKET, not once per distinct volume depth
    (zero-pad slices are batch-independent and sliced back off — exact).
    ``MIA_EVAL_DEPTH_BUCKET`` (default 4) sets the step; 0 disables.
    ``multiple`` additionally forces divisibility (a mesh's data-axis size,
    so the slice stack shards evenly across chips)."""
    import os

    try:
        step = int(os.environ.get("MIA_EVAL_DEPTH_BUCKET", "4") or 0)
    except ValueError:
        step = 4
    step = max(step, 1)
    multiple = max(int(multiple), 1)
    if step % multiple:
        # lcm keeps both the bucket granularity and mesh divisibility
        import math

        step = step * multiple // math.gcd(step, multiple)
    d = -(-d // step) * step if step > 1 else d
    if d % multiple:
        d = -(-d // multiple) * multiple
    return d


def _forward_volume(apply_fn, image_dhwc, patch_size, fetch=True,
                    depth_multiple: int = 1):
    """Resize slices (on device), run the model once, ensemble decoder
    softmaxes, nearest-resize the argmax back (on device). ``fetch=False``
    keeps the prediction on device (deferred-sync eval paths)."""
    d, h, w, c = image_dhwc.shape
    to_patch, back_to_native, _ = _volume_resize_programs(
        (h, w), (int(patch_size[0]), int(patch_size[1]))
    )
    resized = to_patch(jnp.asarray(image_dhwc, jnp.float32))
    d_pad = _depth_bucket(d, depth_multiple)
    if d_pad != d:
        resized = jnp.concatenate(
            [resized, jnp.zeros((d_pad - d,) + resized.shape[1:], resized.dtype)],
            axis=0,
        )
    outputs = apply_fn(resized)
    if d_pad != d:  # strip pad slices from every (D, ...) output
        outputs = jax.tree.map(lambda a: a[:d], outputs)
    masks = outputs["masks"] if isinstance(outputs, dict) else outputs
    masks = _as_decoder_list(masks)
    ensemble = 0.0
    for m in masks:
        if m is None:
            continue
        ensemble = ensemble + jax.nn.softmax(m.astype(jnp.float32), axis=-1)
    pred = jnp.argmax(ensemble, axis=-1).astype(jnp.int32)
    if pred.shape[1:] != (h, w):
        pred = back_to_native(pred)
    return (np.asarray(pred) if fetch else pred), outputs


def test_single_volume(
    image,
    label,
    apply_fn,
    classes: int,
    patch_size=(512, 512),
    loss_fn=None,
    defer=False,
    depth_multiple: int = 1,
):
    """image (1, D, H, W, C) or (D, H, W, C); label (…, D, H, W).

    Returns ([per-class (dice, hd95)], loss). (``validation.py:29-79``.)
    ``defer=True`` returns the ((C−1, 2) metrics, scalar loss) as DEVICE
    arrays with no host sync — callers fetch a whole epoch in one
    ``device_get`` so per-case dispatch runs ahead of the tunnel.
    ``depth_multiple`` pads the slice stack to a mesh-divisible depth
    (pad slices are exact no-ops, stripped before metrics).
    """
    image = np.asarray(image, np.float32)
    label = np.asarray(label, np.int32)
    if image.ndim == 5:
        image, label = image[0], label[0]

    pred, outputs = _forward_volume(
        apply_fn, image, patch_size, fetch=not defer,
        depth_multiple=depth_multiple,
    )

    loss = None
    if loss_fn is not None and isinstance(outputs, dict):
        _, _, labels_to_patch = _volume_resize_programs(
            label.shape[-2:], (int(patch_size[0]), int(patch_size[1]))
        )
        resized_label = labels_to_patch(jnp.asarray(label))
        terms = [
            loss_fn(m, resized_label)[0]
            for m in _as_decoder_list(outputs["low_res_logits"])
            if m is not None and m.shape[1:3] == tuple(patch_size)
        ]
        if not terms:
            terms = [
                loss_fn(m, resized_label)[0]
                for m in _as_decoder_list(outputs["masks"])
                if m is not None
            ]
        if terms:
            loss_dev = jnp.mean(jnp.stack([jnp.asarray(t) for t in terms]))
            loss = loss_dev if defer else float(loss_dev)

    if classes <= 1:  # no foreground classes → empty metric list
        return (jnp.zeros((0, 2), jnp.float32) if defer else []), loss
    hd95_all, _ = _stacked_metric_programs(classes)
    vals = hd95_all(jnp.asarray(pred), jnp.asarray(label))
    if defer:
        return vals, loss
    vals = np.asarray(vals)
    metric_list = [(float(d), float(h)) for d, h in vals]
    return metric_list, loss


def test_single_volume_mean(
    data_path: Path,
    image,
    label,
    apply_fn,
    classes: int,
    patch_size=(512, 512),
    test_save_path: Path | None = None,
    case: str | None = None,
    z_spacing: int = 1,
    raw_spacing=None,
    depth_multiple: int = 1,
):
    """Full test-path evaluation with spacing-aware (dice, hd, asd, jc) and
    optional prediction dumps (``validation.py:424-516``)."""
    image = np.asarray(image, np.float32)
    label = np.asarray(label, np.int32)
    if image.ndim == 5:
        image, label = image[0], label[0]

    pred, _ = _forward_volume(
        apply_fn, image, patch_size, depth_multiple=depth_multiple
    )

    if raw_spacing is None and case is not None and data_path is not None:
        # reference reads the raw case NIfTI for its true spacing and
        # reverses it to (z, y, x) (``validation.py:468-475``)
        raw_case = Path(data_path) / "ACDC_raw" / f"{case}.nii.gz"
        if raw_case.is_file():
            from ...utils.nifti import read_nifti

            _, sp_xyz = read_nifti(raw_case)
            raw_spacing = sp_xyz[::-1]
    if raw_spacing is None:
        raw_spacing = (1.0, 1.0, 1.0)
    sp = tuple(float(s) for s in raw_spacing)

    if classes <= 1:  # no foreground classes → empty metric list
        metric_list = []
    else:
        _, full_all = _stacked_metric_programs(classes)
        vals = np.asarray(
            full_all(jnp.asarray(pred), jnp.asarray(label), jnp.asarray(sp))
        )
        metric_list = [tuple(float(x) for x in row) for row in vals]

    if test_save_path is not None and case is not None:
        from ...utils.nifti import write_nifti

        test_save_path = Path(test_save_path)
        test_save_path.mkdir(parents=True, exist_ok=True)
        # float32 prediction volume with (1, 1, z_spacing) voxel spacing,
        # matching the reference's sitk.WriteImage (``validation.py:485-493``)
        write_nifti(
            test_save_path / f"{case}_pred.nii.gz",
            pred.astype(np.float32),
            (1.0, 1.0, float(z_spacing)),
        )

        result_path = test_save_path / str(case)
        label_path = result_path / "label"
        visual_path = result_path / "visual"
        label_path.mkdir(parents=True, exist_ok=True)
        visual_path.mkdir(parents=True, exist_ok=True)
        for i in range(pred.shape[0]):
            slice_img = (image[i][..., 0] * 255).astype(np.uint8)
            mask = pred[i].astype(np.uint8)
            Image.fromarray(mask).save(label_path / f"slice_{i}.png")
            visual = draw_mask(slice_img, label[i].astype(np.uint8), 0.2)
            visual = draw_mask(visual, mask, 0.4)
            Image.fromarray(visual).save(visual_path / f"slice_{i}.png")

    return metric_list
