"""ctypes bindings for the native host runtime (``native/mia_host.cpp``).

Compiles the shared library on first import (g++ is in the image); every
entry point degrades to the pure-Python path when the library is missing,
so the framework stays importable anywhere.

Surface:
- ``load_image_batch`` — threaded PNG/JPEG decode + PIL-semantics resize +
  normalize, replacing per-sample PIL in the data-loader hot path.
- ``squared_edt_2d`` — exact Felzenszwalb EDT: host cross-check for the
  device EDT kernels.
- ``brush_rle_encode`` / ``brush_rle_decode`` — bit-level Label-Studio
  brush codec.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "mia_host.cpp"
_LIB_PATH = Path(__file__).resolve().parent / "libmia_host.so"
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-fPIC", "-shared", str(_SRC),
                "-o", str(_LIB_PATH), "-lpng", "-ljpeg", "-lpthread",
            ],
            check=True,
            capture_output=True,
            timeout=300,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.is_file() and _SRC.is_file():
        if not _build():
            return None
    if not _LIB_PATH.is_file():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    lib.load_batch.restype = ctypes.c_int
    lib.load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.squared_edt_2d.restype = None
    lib.squared_edt_2d.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_float),
    ]
    lib.brush_rle_encode.restype = ctypes.c_long
    lib.brush_rle_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.POINTER(ctypes.c_uint8)
    ]
    lib.brush_rle_decoded_size.restype = ctypes.c_long
    lib.brush_rle_decoded_size.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
    lib.brush_rle_decode.restype = ctypes.c_long
    lib.brush_rle_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
    ]
    _lib = lib
    return lib


def is_available() -> bool:
    return _load() is not None


def load_image_batch(
    image_paths,
    label_paths=None,
    image_size=(256, 256),
    channels: int = 3,
    num_threads: int = 8,
):
    """Decode + resize a batch natively.

    Returns (images (N, H, W, C) float32 in [0,1], labels (N, H, W) int32 or
    None). Raises RuntimeError if the library is unavailable or any file
    fails to decode (callers fall back to the PIL path).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native host library unavailable")
    n = len(image_paths)
    oh, ow = image_size
    images = np.empty((n, oh, ow, channels), np.float32)
    labels = np.empty((n, oh, ow), np.int32) if label_paths is not None else None

    img_arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in image_paths])
    lbl_arr = (
        (ctypes.c_char_p * n)(*[str(p).encode() for p in label_paths])
        if label_paths is not None
        else None
    )
    failures = lib.load_batch(
        img_arr,
        lbl_arr,
        n,
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) if labels is not None else None,
        oh,
        ow,
        channels,
        num_threads,
    )
    if failures:
        raise RuntimeError(f"native loader failed on {failures} file(s)")
    return images, labels


def squared_edt_2d(feature: np.ndarray, spacing=(1.0, 1.0)) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native host library unavailable")
    feature = np.ascontiguousarray(feature.astype(np.uint8))
    h, w = feature.shape
    out = np.empty((h, w), np.float32)
    lib.squared_edt_2d(
        feature.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, float(spacing[0]), float(spacing[1]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def brush_rle_encode(arr: np.ndarray) -> list[int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native host library unavailable")
    arr = np.ascontiguousarray(arr.astype(np.uint8)).ravel()
    out = np.empty(2 * arr.size + 64, np.uint8)
    n = lib.brush_rle_encode(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        arr.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out[:n].tolist()


def brush_rle_decode(rle) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native host library unavailable")
    data = np.asarray(rle, np.uint8)
    size = lib.brush_rle_decoded_size(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), data.size
    )
    if size < 0:
        raise ValueError("invalid brush RLE payload")
    out = np.empty(size, np.uint8)
    n = lib.brush_rle_decode(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), data.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), size,
    )
    if n != size:
        raise ValueError("brush RLE decode mismatch")
    return out
