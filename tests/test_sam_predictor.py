"""SamPredictor / AMG-utils / ResizeLongestSide tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mia_tpu.models.sam import (
    ResizeLongestSide,
    Sam,
    SamPredictor,
    batched_mask_to_box,
    build_point_grid,
    calculate_stability_score,
    mask_to_rle,
    rle_to_mask,
)


def test_resize_longest_side(rng):
    t = ResizeLongestSide(64)
    img = (rng.random((40, 80, 3)) * 255).astype(np.uint8)
    out = t.apply_image(img)
    assert out.shape == (32, 64, 3)
    coords = np.array([[80.0, 40.0], [0.0, 0.0]])
    mapped = t.apply_coords(coords, (40, 80))
    np.testing.assert_allclose(mapped, [[64.0, 32.0], [0.0, 0.0]])
    boxes = t.apply_boxes(np.array([[0, 0, 80, 40]]), (40, 80))
    np.testing.assert_allclose(boxes, [[0, 0, 64, 32]])


def test_rle_roundtrip_and_boxes(rng):
    mask = rng.random((9, 13)) > 0.6
    rle = mask_to_rle(mask)
    np.testing.assert_array_equal(rle_to_mask(rle), mask)
    box = batched_mask_to_box(np.zeros((2, 8, 8), bool))
    np.testing.assert_array_equal(box, np.zeros((2, 4)))
    m = np.zeros((8, 8), bool)
    m[2:5, 3:7] = True
    np.testing.assert_array_equal(batched_mask_to_box(m[None])[0], [3, 2, 6, 4])


def test_stability_score():
    logits = jnp.asarray(np.full((1, 8, 8), 5.0))  # far above threshold
    s = calculate_stability_score(logits, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(s), 1.0)
    grid = build_point_grid(4)
    assert grid.shape == (16, 2)
    assert (grid > 0).all() and (grid < 1).all()


def test_sam_predictor_end_to_end(rng):
    model = Sam(
        img_size=64,
        num_classes=3,
        encoder_embed_dim=32,
        encoder_depth=2,
        encoder_num_heads=2,
        encoder_global_attn_indexes=(1,),
    )
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, True, 64)

    predictor = SamPredictor(model, variables, max_points=4)
    image = (rng.random((48, 56, 3)) * 255).astype(np.uint8)
    predictor.set_image(image)
    masks, iou, low_res = predictor.predict(
        point_coords=np.array([[28.0, 24.0]]),
        point_labels=np.array([1]),
        multimask_output=True,
    )
    assert masks.shape == (3, 48, 56)
    assert masks.dtype == bool
    assert iou.shape == (3,)
    # box prompt path
    masks_b, _, _ = predictor.predict(box=np.array([5, 5, 40, 40]))
    assert masks_b.shape == (3, 48, 56)
