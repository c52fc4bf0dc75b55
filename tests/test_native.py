"""Native host runtime (C++ via ctypes) vs Python-path golden values."""

import numpy as np
import pytest
from PIL import Image
from scipy import ndimage

from mia_tpu import native

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native library failed to build"
)


def test_native_image_batch_matches_pil(tmp_path, rng):
    from mia_tpu.data.base import host_joint_resize, load_image_grayscale, load_label

    img_paths, lbl_paths = [], []
    for i in range(4):
        ip = tmp_path / f"i{i}.png"
        lp = tmp_path / f"l{i}.png"
        Image.fromarray(rng.integers(0, 256, (40, 52), dtype=np.uint8)).save(ip)
        Image.fromarray(rng.integers(0, 3, (40, 52), dtype=np.uint8)).save(lp)
        img_paths.append(ip)
        lbl_paths.append(lp)

    images, labels = native.load_image_batch(
        img_paths, lbl_paths, image_size=(32, 32), channels=3, num_threads=2
    )
    assert images.shape == (4, 32, 32, 3)
    assert labels.shape == (4, 32, 32)

    for i in range(4):
        ref_img = load_image_grayscale(img_paths[i], 3)
        ref_lbl = load_label(lbl_paths[i])
        ref_img, ref_lbl = host_joint_resize(ref_img, ref_lbl, (32, 32))
        np.testing.assert_allclose(images[i], ref_img, atol=2e-3)
        # nearest-neighbor sampling grid matches PIL exactly
        np.testing.assert_array_equal(labels[i], ref_lbl)


def test_native_jpeg_decode(tmp_path, rng):
    p = tmp_path / "x.jpg"
    Image.fromarray(rng.integers(0, 256, (33, 47), dtype=np.uint8)).save(p, quality=95)
    images, _ = native.load_image_batch([p], None, image_size=(33, 47), channels=1)
    ref = np.asarray(Image.open(p).convert("L"), np.float32) / 255.0
    np.testing.assert_allclose(images[0, ..., 0], ref, atol=2e-2)


def test_native_edt_matches_scipy(rng):
    feature = rng.random((37, 41)) > 0.9
    feature[0, 0] = True  # ensure nonempty
    ours = native.squared_edt_2d(feature, spacing=(1.0, 1.0))
    ref = ndimage.distance_transform_edt(~feature) ** 2
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)
    # anisotropic
    ours_a = native.squared_edt_2d(feature, spacing=(2.0, 0.5))
    ref_a = ndimage.distance_transform_edt(~feature, sampling=(2.0, 0.5)) ** 2
    np.testing.assert_allclose(ours_a, ref_a, rtol=1e-5, atol=1e-4)


def test_native_rle_matches_python_codec(rng):
    from mia_tpu.tools.label_studio import decode_rle, encode_rle

    for n in (17, 3000, 70000):
        arr = (rng.random(n) > 0.5).astype(np.uint8) * 255
        native_rle = native.brush_rle_encode(arr)
        # byte-identical to the Python codec
        assert native_rle == encode_rle(arr)
        np.testing.assert_array_equal(native.brush_rle_decode(native_rle), arr)
        # cross-decode
        np.testing.assert_array_equal(decode_rle(native_rle), arr)
    # long constant run > 2**16
    arr = np.zeros(70000, np.uint8)
    arr[:65999] = 255
    assert native.brush_rle_encode(arr) == encode_rle(arr)


def test_batch_loader_native_path_matches_pil(tmp_path, rng):
    import sys

    sys.path.insert(0, "tests")
    from synth_data import make_fugc

    from mia_tpu.data import BatchLoader, ExtendableDataset, FUGCDataset

    make_fugc(tmp_path, n_train=6, size=(40, 48), rng=rng)
    ds = FUGCDataset(tmp_path, split="train", image_size=32)
    view = ExtendableDataset(ds, ds.case_names()[:4])

    native_loader = BatchLoader(view, batch_size=2, shuffle=False, device_put=False,
                                num_prefetch=0)
    batch = next(iter(native_loader))
    # ground truth via the PIL path
    ref = [ds.get_sample(ds.case_name_to_idx[view.image_idx[i]]
                         if hasattr(ds, "case_name_to_idx") else i)
           for i in range(2)]
    ref0 = view.get_sample(0)
    # the loader's native path ships uint8 (PIL's own uint8-resize rounding
    # convention): native float resize (±2e-3 of PIL) + byte rounding (±0.5/255)
    assert batch["image"].dtype == np.uint8
    np.testing.assert_allclose(
        batch["image"][0].astype(np.float32) / 255.0, ref0["image"], atol=4e-3
    )
    np.testing.assert_array_equal(batch["label"][0], ref0["label"])
    assert batch["case_name"][0] == ref0["case_name"]
