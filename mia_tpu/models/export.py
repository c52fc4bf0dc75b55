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
