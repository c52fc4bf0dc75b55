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


def test_sam_prompt_program_export_roundtrip(tmp_path):
    """Exported prompt->mask StableHLO reproduces the live SamPredictor
    decoder outputs (SamOnnxModel counterpart, onnx.py:16-144)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mia_tpu.models.export import export_sam_prompt_program, load_exported
    from mia_tpu.models.sam.sam import Sam

    sam = Sam(
        img_size=64, num_classes=3, encoder_embed_dim=32, encoder_depth=1,
        encoder_num_heads=2, encoder_global_attn_indexes=(0,),
    )
    def init_all(mdl):
        # trace every param path incl. the mask prompt (mask_downscaling)
        sparse, dense = mdl.prompt_encoder(
            points=(jnp.zeros((1, 2, 2)), jnp.zeros((1, 2), jnp.int32)),
            boxes=jnp.zeros((1, 4)),
            masks=jnp.zeros((1, 16, 16, 1)),
        )
        out = mdl.mask_decoder(
            jnp.zeros((1, 4, 4, 256)), mdl.prompt_encoder.get_dense_pe(),
            sparse, dense, True,
        )
        mdl.image_encoder(jnp.zeros((1, 64, 64, 3)))
        return out

    variables = sam.init(jax.random.PRNGKey(0), method=init_all)

    data = export_sam_prompt_program(sam, variables, max_points=4)
    (tmp_path / "sam_prompt.stablehlo").write_bytes(data)
    fn = load_exported(tmp_path / "sam_prompt.stablehlo")

    e = 64 // 16
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((1, e, e, 256)).astype(np.float32)
    coords = np.array([[[10.0, 12.0], [30.0, 40.0], [0, 0], [0, 0]]], np.float32)
    labels = np.array([[1, 0, -1, -1]], np.int32)
    mask_in = np.zeros((1, 4 * e, 4 * e, 1), np.float32)
    has_mask = np.zeros((1,), np.float32)

    masks, iou, low_res = fn(emb, coords, labels, mask_in, has_mask)
    assert np.asarray(masks).shape == (1, 64, 64, 3)
    assert np.asarray(iou).shape == (1, 3)
    assert np.asarray(low_res).shape == (1, 4 * e, 4 * e, 3)
    assert np.isfinite(np.asarray(masks)).all()

    # parity vs the live module applied the same way
    def live(emb, coords, labels, mask_in, has_mask):
        def apply_fn(mdl):
            pe = mdl.prompt_encoder
            pts = jnp.asarray(coords) + 0.5
            pemb = pe.pe_layer.forward_with_coords(pts, pe.input_image_size)
            lbl = jnp.asarray(labels)[..., None]
            pemb = jnp.where(lbl == -1, pe.not_a_point_embed[0], pemb)
            for i in range(4):
                pemb = pemb + jnp.where(lbl == i, pe.point_embeddings[i], 0.0)
            dense_m = pe.mask_downscaling(jnp.asarray(mask_in))
            no_m = pe.no_mask_embed[0].reshape(1, 1, 1, -1)
            gate = jnp.asarray(has_mask).reshape(-1, 1, 1, 1)
            dense = dense_m * gate + no_m * (1.0 - gate)
            return mdl.mask_decoder(
                jnp.asarray(emb), pe.get_dense_pe(), pemb, dense, True
            )
        return sam.apply(variables, method=apply_fn)

    low_live, iou_live = live(emb, coords, labels, mask_in, has_mask)
    np.testing.assert_allclose(
        np.asarray(low_res), np.asarray(low_live), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(iou), np.asarray(iou_live), rtol=1e-5, atol=1e-5
    )

    # the has_mask gate switches the dense path
    masks2, _, _ = fn(emb, coords, labels, mask_in + 1.0, np.ones((1,), np.float32))
    assert not np.allclose(np.asarray(masks2), np.asarray(masks))
