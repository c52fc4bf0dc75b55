"""Synthetic dataset fixtures in the reference's on-disk layouts."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
from PIL import Image


def _save_gray(path: Path, arr: np.ndarray):
    Image.fromarray(arr.astype(np.uint8)).save(path)


def make_fugc(root: Path, n_train=6, n_val=2, n_test=2, size=(40, 48), rng=None):
    rng = rng or np.random.default_rng(0)
    for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
        img_dir = root / split / "images"
        lbl_dir = root / split / "labels"
        img_dir.mkdir(parents=True, exist_ok=True)
        lbl_dir.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            name = f"{split}_{i:03d}"
            _save_gray(img_dir / f"{name}.png", rng.integers(0, 256, size))
            _save_gray(lbl_dir / f"{name}.png", rng.integers(0, 3, size))
    return root


def make_busi(root: Path, n=8, size=(32, 32), rng=None):
    rng = rng or np.random.default_rng(0)
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "labels").mkdir(parents=True, exist_ok=True)
    ids = list(range(n))
    for i in ids:
        _save_gray(root / "images" / f"{i:04}.png", rng.integers(0, 256, size))
        _save_gray(root / "labels" / f"{i:04}.png", rng.integers(0, 2, size))
    split = {"train": ids[: n // 2], "valid": ids[n // 2 :], "test": ids[n // 2 :]}
    (root / "split.json").write_text(json.dumps(split))
    return root


def make_acdc(root: Path, n_slices=6, n_vols=2, size=(32, 32), depth=4, rng=None):
    import h5py

    rng = rng or np.random.default_rng(0)
    data_dir = root / "ACDC" / "data"
    (data_dir / "slices").mkdir(parents=True, exist_ok=True)
    slice_names, vol_names = [], []
    for i in range(n_slices):
        name = f"patient{i:03d}_frame01_slice_{i}"
        with h5py.File(data_dir / "slices" / f"{name}.h5", "w") as f:
            f.create_dataset("image", data=rng.random(size).astype(np.float32))
            f.create_dataset("label", data=rng.integers(0, 4, size).astype(np.uint8))
        slice_names.append(name)
    for i in range(n_vols):
        name = f"patient{100 + i:03d}_frame01"
        with h5py.File(data_dir / f"{name}.h5", "w") as f:
            f.create_dataset(
                "image", data=rng.random((depth, *size)).astype(np.float32)
            )
            f.create_dataset(
                "label", data=rng.integers(0, 4, (depth, *size)).astype(np.uint8)
            )
        vol_names.append(name)
    (root / "ACDC" / "train_slices.list").write_text("\n".join(slice_names) + "\n")
    (root / "ACDC" / "val.list").write_text("\n".join(vol_names) + "\n")
    (root / "ACDC" / "test.list").write_text("\n".join(vol_names) + "\n")
    rows = ["case,sz,sy,sx"]
    for i in range(n_slices):
        rows.append(f"patient{i:03d}_frame01,10.0,1.48,1.48")
    for i in range(n_vols):
        rows.append(f"patient{100 + i:03d}_frame01,10.0,1.48,1.48")
    (root / "ACDC" / "raw_spacing.csv").write_text("\n".join(rows) + "\n")
    return root


def make_tn3k(root: Path, n=6, size=(32, 32), rng=None):
    rng = rng or np.random.default_rng(0)
    for d in ("trainval-image", "trainval-mask", "test-image", "test-mask"):
        (root / d).mkdir(parents=True, exist_ok=True)
    ids = list(range(n))
    for i in ids:
        _save_gray(root / "trainval-image" / f"{i:04}.jpg", rng.integers(0, 256, size))
        _save_gray(root / "trainval-mask" / f"{i:04}.jpg", rng.integers(0, 2, size) * 255)
    for i in range(2):
        _save_gray(root / "test-image" / f"t{i:03}.jpg", rng.integers(0, 256, size))
        _save_gray(root / "test-mask" / f"t{i:03}.jpg", rng.integers(0, 2, size) * 255)
    split = {"train": ids[: n // 2], "val": ids[n // 2 :]}
    (root / "tn3k-trainval-fold0.json").write_text(json.dumps(split))
    return root
