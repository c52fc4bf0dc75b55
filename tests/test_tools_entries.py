"""Tools + entry-point tests: LS RLE codec, mask2rle/rle2mask round trip,
legacy UNet torch import parity, fugc2025_predict end-to-end."""

import json

import numpy as np
import pytest
import torch
from PIL import Image

import jax
import jax.numpy as jnp

from mia_tpu.tools import decode_rle, encode_rle, mask2rle


def test_rle_roundtrip(rng):
    for shape in [(7,), (300,), (70000,)]:
        arr = (rng.random(shape) > 0.5).astype(np.uint8) * 255
        assert np.array_equal(decode_rle(encode_rle(arr)), arr)
    # long constant runs > 2**16
    arr = np.zeros(70000, np.uint8)
    arr[:65999] = 255
    assert np.array_equal(decode_rle(encode_rle(arr)), arr)


def test_mask2rle_rgba_convention(rng):
    mask = (rng.random((10, 12)) > 0.5).astype(np.uint8) * 255
    flat = decode_rle(mask2rle(mask))
    back = flat.reshape(10, 12, 4)[:, :, 0]
    assert np.array_equal(back, mask)


def test_mask2rle_rle2mask_end_to_end(tmp_path, rng):
    from mia_tpu.entry.fugc2025.preprocess.mask2rle import mask2rle_entry
    from mia_tpu.entry.fugc2025.preprocess.rle2mask import rle2mask_entry

    image_dir = tmp_path / "images"
    label_dir = tmp_path / "labels"
    image_dir.mkdir()
    label_dir.mkdir()
    mask = np.zeros((20, 24), np.uint8)
    mask[4:12, 6:14] = 1
    mask[14:18, 2:8] = 2
    img = (rng.random((20, 24)) * 255).astype(np.uint8)
    Image.fromarray(img).save(image_dir / "labeled_data_000.png")
    Image.fromarray(mask).save(label_dir / "labeled_data_000.png")

    out_json = tmp_path / "project.json"
    mask2rle_entry(
        [
            "--image-dir", str(image_dir),
            "--label-dir", str(label_dir),
            "--unlabel-dir", str(label_dir),
            "--output-path", str(out_json),
        ]
    )
    data = json.loads(out_json.read_text())
    assert len(data) == 1
    assert data[0]["data"]["type"] == "labeled"
    assert len(data[0]["predictions"][0]["result"]) == 2

    # feed back as annotations → masks
    for task in data:
        task["annotations"] = task.pop("predictions")
        # fix width/height swap quirk for the round trip (reference parity)
        for res in task["annotations"][0]["result"]:
            res["original_width"], res["original_height"] = 24, 20
    (tmp_path / "annotated.json").write_text(json.dumps(data))
    save_dir = tmp_path / "out"
    rle2mask_entry(
        [
            "--image-dir", str(image_dir),
            "--label-dir", str(tmp_path / "empty"),
            "--mask-file", str(tmp_path / "annotated.json"),
            "--save-dir", str(save_dir),
            "--threshold", "2",
        ]
    )
    back = np.array(Image.open(save_dir / "labels" / "labeled_data_000.png"))
    assert np.array_equal(back, mask)


def test_legacy_unet_torch_parity(rng):
    import sys

    sys.path.insert(0, "tests")
    from mia_tpu.models.legacy_unet import (
        LegacyUNet,
        LegacyUNetConfig,
        import_legacy_torch_checkpoint,
    )

    # minimal torch restatement of the legacy UNet (non-bilinear), to mint a
    # state_dict in the reference's key layout
    import torch.nn as tn

    class DoubleConv(tn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.double_conv = tn.Sequential(
                tn.Conv2d(cin, cout, 3, padding=1, bias=False),
                tn.BatchNorm2d(cout),
                tn.LeakyReLU(inplace=True),
                tn.Conv2d(cout, cout, 3, padding=1, bias=False),
                tn.BatchNorm2d(cout),
                tn.LeakyReLU(inplace=True),
            )

        def forward(self, x):
            return self.double_conv(x)

    class Down(tn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.maxpool_conv = tn.Sequential(tn.MaxPool2d(2), DoubleConv(cin, cout))

        def forward(self, x):
            return self.maxpool_conv(x)

    class Up(tn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.up = tn.ConvTranspose2d(cin, cin // 2, 2, stride=2)
            self.conv = DoubleConv(cin, cout)

        def forward(self, x1, x2):
            x1 = self.up(x1)
            return self.conv(torch.cat([x2, x1], dim=1))

    class TorchLegacy(tn.Module):
        def __init__(self, cin=3, ncls=3):
            super().__init__()
            self.inc = DoubleConv(cin, 8)
            self.down1 = Down(8, 16)
            self.down2 = Down(16, 32)
            self.down3 = Down(32, 64)
            self.down4 = Down(64, 128)
            self.up1 = Up(128, 64)
            self.up2 = Up(64, 32)
            self.up3 = Up(32, 16)
            self.up4 = Up(16, 8)
            self.outc = tn.Sequential()
            self.outc.conv = tn.Conv2d(8, ncls, 1)

        def forward(self, x):
            x1 = self.inc(x)
            x2 = self.down1(x1)
            x3 = self.down2(x2)
            x4 = self.down3(x3)
            x5 = self.down4(x4)
            x = self.up1(x5, x4)
            x = self.up2(x, x3)
            x = self.up3(x, x2)
            x = self.up4(x, x1)
            return self.outc.conv(x)

    tmodel = TorchLegacy().eval()
    x = rng.random((1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    cfg = LegacyUNetConfig(n_channels=3, n_classes=3, width=8)
    model = LegacyUNet(cfg)
    variables = import_legacy_torch_checkpoint(tmodel.state_dict())
    # channel plan differs (64.. vs 8..): apply with imported params directly
    out = model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=1e-4
    )


def test_fugc_predict_end_to_end(tmp_path, rng):
    from flax import serialization

    from mia_tpu.entry.fugc2025.predict import model as PredictModel, predict_entry
    from mia_tpu.models.legacy_unet import LegacyUNet, LegacyUNetConfig

    # mint 2 random msgpack fold checkpoints
    net = LegacyUNet(LegacyUNetConfig(n_channels=3, n_classes=3))
    for fold in (0, 1):
        variables = net.init(jax.random.PRNGKey(fold), jnp.zeros((1, 32, 32, 3)), train=False)
        d = tmp_path / "work" / f"fold_{fold}"
        d.mkdir(parents=True)
        (d / "model.msgpack").write_bytes(serialization.to_bytes(variables))

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray((rng.random((40, 48, 3)) * 255).astype(np.uint8)).save(
        img_dir / "a.png"
    )

    out_dir = tmp_path / "preds"
    vis_dir = tmp_path / "vis"
    predict_entry(
        [
            "--work-dir", str(tmp_path / "work"),
            "--images", str(img_dir),
            "--output-dir", str(out_dir),
            "--visualize-dir", str(vis_dir),
            "--run-model",
            "--image-size", "32",
            "--folds", "0", "1",
        ]
    )
    pred = np.array(Image.open(out_dir / "a.png"))
    assert pred.shape == (40, 48)
    assert set(np.unique(pred)) <= {0, 1, 2}
    assert (vis_dir / "a.png").is_file()
