"""Model export — the TPU-native counterpart of the reference's ONNX path
(``src/models/segment_anything/utils/onnx.py``, upstream SAM's deployment
export). Instead of ONNX, JAX programs serialize to StableHLO via
``jax.export``: portable across JAX versions/devices and loadable for
serving without the Python model definition.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

import jax


def export_apply(fn: Callable, *example_args) -> bytes:
    """Serialize ``jit(fn)(*example_args)`` to portable StableHLO bytes."""
    exported = jax.export.export(jax.jit(fn))(*example_args)
    return exported.serialize()


def save_exported(path: str | Path, fn: Callable, *example_args) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(export_apply(fn, *example_args))
    return path


def load_exported(path_or_bytes) -> Callable:
    """Load serialized StableHLO back into a callable (no model code
    needed)."""
    data = (
        path_or_bytes
        if isinstance(path_or_bytes, (bytes, bytearray))
        else Path(path_or_bytes).read_bytes()
    )
    exported = jax.export.deserialize(bytearray(data))
    return exported.call


def export_unet_forward(model, variables, sample_input) -> bytes:
    """Freeze a UNet's variables into an exported forward program."""

    def forward(images):
        return model.apply(variables, images, train=False)

    return export_apply(forward, sample_input)


def export_sam_prompt_program(sam, variables, max_points: int = 8) -> bytes:
    """StableHLO counterpart of the reference's ``SamOnnxModel``
    (``src/models/segment_anything/utils/onnx.py:16-144``): a frozen
    prompt→mask SERVING program over precomputed image embeddings.

    Inputs (fixed prompt slots — prompt counts never retrigger anything):
    - ``image_embeddings`` (1, E, E, 256) from ``Sam.get_image_embeddings``
    - ``point_coords`` (1, P, 2) in the model input frame, (x, y)
    - ``point_labels`` (1, P) upstream convention: −1 pad, 0 negative,
      1 positive, 2 box top-left, 3 box bottom-right
    - ``mask_input`` (1, 4E, 4E, 1) low-res mask prompt
    - ``has_mask_input`` (1,) 1.0/0.0 gate (blends with the no-mask embed,
      exactly like ``SamOnnxModel._embed_masks``)

    Outputs: (masks upscaled to (1, img, img, M), iou (1, M),
    low_res (1, 4E, 4E, M)).
    """
    import jax.numpy as jnp

    e = sam.img_size // 16

    def program(image_embeddings, point_coords, point_labels, mask_input, has_mask):
        def apply_fn(mdl):
            from ..ops.resize import resize as _resize

            pe = mdl.prompt_encoder
            pts = point_coords + 0.5
            pemb = pe.pe_layer.forward_with_coords(pts, pe.input_image_size)
            lbl = point_labels[..., None]
            pemb = jnp.where(lbl == -1, pe.not_a_point_embed[0], pemb)
            for i in range(4):  # 0/1 points, 2/3 box corners (onnx.py:43-68)
                pemb = pemb + jnp.where(lbl == i, pe.point_embeddings[i], 0.0)
            dense_m = pe.mask_downscaling(mask_input)
            no_m = pe.no_mask_embed[0].reshape(1, 1, 1, -1)
            gate = has_mask.reshape(-1, 1, 1, 1)
            dense = dense_m * gate + no_m * (1.0 - gate)
            low_res, iou = mdl.mask_decoder(
                image_embeddings, pe.get_dense_pe(), pemb, dense, True
            )
            masks = _resize(
                low_res, (mdl.img_size, mdl.img_size), "bilinear", antialias=False
            )
            return masks, iou, low_res

        return sam.apply(variables, method=apply_fn)

    import numpy as np

    ex = (
        jax.ShapeDtypeStruct((1, e, e, 256), np.float32),
        jax.ShapeDtypeStruct((1, max_points, 2), np.float32),
        jax.ShapeDtypeStruct((1, max_points), np.int32),
        jax.ShapeDtypeStruct((1, 4 * e, 4 * e, 1), np.float32),
        jax.ShapeDtypeStruct((1,), np.float32),
    )
    exported = jax.export.export(jax.jit(program))(*ex)
    return exported.serialize()
