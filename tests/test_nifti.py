"""Dependency-free NIfTI codec: roundtrip, dtype coverage, spacing, and the
SAM test-path wiring (raw-case spacing read + prediction dump —
reference ``validation.py:468-493``)."""

import gzip
import struct

import numpy as np
import pytest

from mia_tpu.utils.nifti import read_nifti, write_nifti


@pytest.mark.parametrize(
    "dtype", [np.uint8, np.int16, np.int32, np.float32, np.float64, np.int64]
)
def test_roundtrip_dtypes(tmp_path, dtype):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.floating):
        vol = rng.standard_normal((5, 6, 7)).astype(dtype)
    else:
        vol = rng.integers(0, 100, (5, 6, 7)).astype(dtype)
    path = tmp_path / "vol.nii.gz"
    write_nifti(path, vol, (1.25, 1.5, 8.0))
    back, spacing = read_nifti(path)
    np.testing.assert_array_equal(back, vol.astype(back.dtype))
    np.testing.assert_allclose(spacing, (1.25, 1.5, 8.0), rtol=1e-6)


def test_roundtrip_uncompressed_and_2d(tmp_path):
    vol = np.arange(30, dtype=np.float32).reshape(5, 6)
    path = tmp_path / "flat.nii"
    write_nifti(path, vol, (2.0, 3.0))
    back, spacing = read_nifti(path)
    np.testing.assert_array_equal(back, vol)
    assert spacing[:2] == (2.0, 3.0)


def test_fortran_order_on_disk(tmp_path):
    """x must vary fastest on disk (NIfTI contract — what any external
    reader assumes)."""
    vol = np.arange(24, dtype=np.int32).reshape(2, 3, 4)  # (z, y, x)
    path = tmp_path / "order.nii"
    write_nifti(path, vol)
    raw = path.read_bytes()
    dim = struct.unpack_from("<8h", raw, 40)
    assert tuple(dim[:4]) == (3, 4, 3, 2)  # ndim, nx, ny, nz
    data = np.frombuffer(raw[352:], dtype=np.int32)
    # first row on disk = vol[0, 0, :]
    np.testing.assert_array_equal(data[:4], vol[0, 0])


def test_scl_slope_applied(tmp_path):
    vol = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    path = tmp_path / "scaled.nii"
    write_nifti(path, vol)
    raw = bytearray(path.read_bytes())
    struct.pack_into("<2f", raw, 112, 2.0, 1.0)  # slope 2, inter 1
    path.write_bytes(bytes(raw))
    back, _ = read_nifti(path)
    np.testing.assert_allclose(back, vol * 2.0 + 1.0)


def test_rejects_garbage(tmp_path):
    path = tmp_path / "bad.nii"
    path.write_bytes(b"\x00" * 400)
    with pytest.raises(ValueError):
        read_nifti(path)


def test_sam_test_path_reads_raw_spacing_and_writes_nifti(tmp_path):
    """test_single_volume_mean picks up data_path/ACDC_raw/{case}.nii.gz
    spacing (reversed to z,y,x) and dumps {case}_pred.nii.gz."""
    import jax.numpy as jnp

    from mia_tpu.models.sam.validation import test_single_volume_mean

    case = "patient001"
    raw_dir = tmp_path / "ACDC_raw"
    raw_dir.mkdir()
    write_nifti(raw_dir / f"{case}.nii.gz",
                np.zeros((3, 8, 8), np.float32), (1.5, 1.5, 10.0))

    depth, size, classes = 3, 16, 3

    def apply_fn(images):
        n = images.shape[0]
        logits = jnp.zeros((n, size, size, classes))
        logits = logits.at[..., 1].set(1.0)
        return {"masks": [logits]}

    image = np.random.default_rng(0).random((depth, size, size, 1), np.float32)
    label = np.ones((depth, size, size), np.int32)
    save = tmp_path / "out"
    metrics = test_single_volume_mean(
        tmp_path, image, label, apply_fn, classes=classes,
        patch_size=(size, size), test_save_path=save, case=case, z_spacing=5,
    )
    assert len(metrics) == classes - 1
    # class 1 everywhere → dice 1 for class 1
    assert metrics[0][0] == pytest.approx(1.0)

    pred_vol, spacing = read_nifti(save / f"{case}_pred.nii.gz")
    assert pred_vol.shape == (depth, size, size)
    assert spacing == (1.0, 1.0, 5.0)
    np.testing.assert_array_equal(pred_vol, np.ones_like(pred_vol))
