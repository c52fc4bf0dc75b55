"""StableHLO export round-trip (the ONNX-analogue deployment path)."""

import numpy as np

import jax
import jax.numpy as jnp

from mia_tpu.models import UNet, UNetConfig
from mia_tpu.models.export import export_unet_forward, load_exported, save_exported


def test_unet_export_roundtrip(tmp_path, rng):
    cfg = UNetConfig(in_channels=1, out_classes=3, channels_list=(4, 8), dropout_prob=None)
    model = UNet(cfg)
    x = jnp.asarray(rng.random((1, 32, 32, 1), np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    blob = export_unet_forward(model, variables, x)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    path = save_exported(tmp_path / "unet.stablehlo", lambda img: model.apply(variables, img, train=False), x)
    fn = load_exported(path)
    out = fn(x)
    ref = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
