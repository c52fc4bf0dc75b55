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


@pytest.mark.parametrize("exact_prompts", [False, True])
def test_amg_batched_matches_per_point(rng, exact_prompts):
    """The batched grid program must reproduce the per-point predictor
    loop exactly — in both prompt-slot modes: same kept masks
    (point-major order) and iou scores."""
    from mia_tpu.models.sam import SamAutomaticMaskGenerator

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
    predictor = SamPredictor(
        model, variables, max_points=4, exact_prompts=exact_prompts
    )
    image = (rng.random((48, 56, 3)) * 255).astype(np.uint8)

    # thresholds low enough that an untrained model keeps some masks;
    # points_per_batch=3 over a 2x2 grid exercises the padded final chunk
    amg = SamAutomaticMaskGenerator(
        predictor,
        points_per_side=2,
        points_per_batch=3,
        pred_iou_thresh=-1e9,
        stability_score_thresh=-1.0,
        box_nms_thresh=1.01,  # keep everything: order must match the loop
        min_mask_region_area=0,
    )
    records = amg.generate(image)
    assert len(records) == 4 * 3  # every (point, mask) pair survives

    # reference computation: the old per-point loop, inlined
    predictor.set_image(image)
    h, w = image.shape[:2]
    points = amg.point_grids * np.array([w, h])
    exp_masks, exp_iou = [], []
    for point in points:
        masks, iou, _ = predictor.predict(
            point_coords=point[None],
            point_labels=np.array([1]),
            multimask_output=True,
            return_logits=True,
        )
        exp_masks.append(masks > model.mask_threshold)
        exp_iou.append(iou)
    exp_masks = np.concatenate(exp_masks)
    exp_iou = np.concatenate(exp_iou)
    # box NMS emits survivors in score order even when none are suppressed
    order = np.argsort(-exp_iou, kind="stable")
    exp_masks, exp_iou = exp_masks[order], exp_iou[order]

    got_masks = np.stack([r["segmentation"] for r in records])
    got_iou = np.array([r["predicted_iou"] for r in records])
    np.testing.assert_array_equal(got_masks, exp_masks)
    np.testing.assert_allclose(got_iou, exp_iou, rtol=1e-5, atol=1e-6)
    for r in records:
        np.testing.assert_array_equal(rle_to_mask(r["rle"]), r["segmentation"])


def test_predict_batch_matches_sequential(rng):
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

    coords = np.array([[[10.0, 12.0]], [[30.0, 20.0]], [[44.0, 40.0]]])
    labels = np.ones((3, 1), np.int32)
    masks_b, iou_b, low_b = predictor.predict_batch(
        coords, labels, multimask_output=True, return_logits=True
    )
    assert masks_b.shape == (3, 3, 48, 56)
    for i in range(3):
        m, iou, low = predictor.predict(
            point_coords=coords[i],
            point_labels=labels[i],
            multimask_output=True,
            return_logits=True,
        )
        np.testing.assert_allclose(masks_b[i], m, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(iou_b[i], iou, rtol=1e-5, atol=1e-6)
        # low-res rides the wire as float16 (predictor.py docstring): a
        # tiny batch-vs-single f32 tiling difference can quantize to one
        # f16 ulp (~4.9e-4 relative), so the bound is the wire precision
        np.testing.assert_allclose(low_b[i], low, rtol=1e-3, atol=5e-4)


def test_predictor_parity_vs_torch(rng):
    """Numeric parity of the full predictor serving path — embed →
    point-prompt encode → decode → postprocess — against a PyTorch
    restatement of the reference flow (``predictor.py:92-168``) from
    IDENTICAL weights."""
    import torch
    import torch.nn.functional as F

    from torch_sam_ref import (
        JaxParams,
        dense_pe,
        image_encoder,
        mask_decoder,
        prompt_encoder_plain,
    )
    from mia_tpu.models.sam.sam import PIXEL_MEAN, PIXEL_STD

    model = Sam(
        img_size=64,
        num_classes=3,
        encoder_embed_dim=32,
        encoder_depth=2,
        encoder_num_heads=2,
        encoder_global_attn_indexes=(1,),
    )
    x0 = jnp.ones((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, True, 64)
    predictor = SamPredictor(model, variables, max_points=4)
    image = (rng.random((48, 56, 3)) * 255).astype(np.uint8)
    predictor.set_image(image)
    point = np.array([[30.0, 22.0]])
    label = np.array([1])
    masks, iou, low_res = predictor.predict(
        point_coords=point, point_labels=label,
        multimask_output=True, return_logits=True,
    )

    # --- torch restatement from the same params -------------------------
    p = JaxParams(variables["params"])
    with torch.no_grad():
        resized = predictor.transform.apply_image(image)  # same host resize
        xt = torch.tensor(np.asarray(resized, np.float32))[None]
        xt = (xt - torch.tensor(PIXEL_MEAN)) / torch.tensor(PIXEL_STD)
        h_in, w_in = resized.shape[:2]
        xt = F.pad(xt, (0, 0, 0, 64 - w_in, 0, 64 - h_in))
        emb = image_encoder(
            p, xt, depth=2, num_heads=2, window_size=14,
            global_attn_indexes=(1,), lora_rank=0,
        )
        # predictor pads point slots to max_points with label -1
        coords = np.zeros((1, 4, 2), np.float32)
        labels_np = -np.ones((1, 4), np.int32)
        coords[0, :1] = predictor.transform.apply_coords(point, image.shape[:2])
        labels_np[0, :1] = label
        sparse, dense = prompt_encoder_plain(
            p,
            points=(torch.tensor(coords), torch.tensor(labels_np)),
            embed_dim=256,
            image_embedding_size=(4, 4),
            input_image_size=(64, 64),
        )
        lowres_t, iou_t, _ = mask_decoder(
            p, "mask_decoder/core", "mask_decoder/transformer",
            emb, dense_pe(p, (4, 4)), sparse, dense,
            num_mask_tokens=4, stages=2,
        )
        lowres_t = lowres_t[..., 1:]  # multimask drops token 0
        iou_t = iou_t[:, 1:]
        up = F.interpolate(
            lowres_t.permute(0, 3, 1, 2), (64, 64),
            mode="bilinear", align_corners=False,
        )[:, :, :h_in, :w_in]
        masks_t = F.interpolate(
            up, tuple(image.shape[:2]), mode="bilinear", align_corners=False
        )

    np.testing.assert_allclose(
        low_res, lowres_t.permute(0, 3, 1, 2)[0].numpy(), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(iou, iou_t[0].numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(masks, masks_t[0].numpy(), rtol=2e-3, atol=5e-4)


def test_predictor_exact_prompts_matches_reference_token_count(rng):
    """exact_prompts=True sizes the prompt tokens exactly like the
    reference (n points + 1 pad): parity vs the torch restatement with NO
    extra padded slots, and a check that the fixed-slot default deviates
    only slightly."""
    import torch
    import torch.nn.functional as F

    from torch_sam_ref import (
        JaxParams,
        dense_pe,
        image_encoder,
        mask_decoder,
        prompt_encoder_plain,
    )
    from mia_tpu.models.sam.sam import PIXEL_MEAN, PIXEL_STD

    model = Sam(
        img_size=64,
        num_classes=3,
        encoder_embed_dim=32,
        encoder_depth=2,
        encoder_num_heads=2,
        encoder_global_attn_indexes=(1,),
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3), jnp.float32), True, 64
    )
    image = (rng.random((48, 56, 3)) * 255).astype(np.uint8)
    point = np.array([[30.0, 22.0]])
    label = np.array([1])

    exact = SamPredictor(model, variables, max_points=4, exact_prompts=True)
    exact.set_image(image)
    _, _, low_exact = exact.predict(
        point_coords=point, point_labels=label, return_logits=True
    )

    p = JaxParams(variables["params"])
    with torch.no_grad():
        resized = exact.transform.apply_image(image)
        xt = torch.tensor(np.asarray(resized, np.float32))[None]
        xt = (xt - torch.tensor(PIXEL_MEAN)) / torch.tensor(PIXEL_STD)
        h_in, w_in = resized.shape[:2]
        xt = F.pad(xt, (0, 0, 0, 64 - w_in, 0, 64 - h_in))
        emb = image_encoder(
            p, xt, depth=2, num_heads=2, window_size=14,
            global_attn_indexes=(1,), lora_rank=0,
        )
        coords_t = torch.tensor(
            exact.transform.apply_coords(point, image.shape[:2])[None]
        ).float()
        sparse, dense = prompt_encoder_plain(
            p, points=(coords_t, torch.tensor(label[None])),
            embed_dim=256, image_embedding_size=(4, 4),
            input_image_size=(64, 64),
        )
        assert sparse.shape[1] == 2  # 1 real point + 1 pad — reference-exact
        lowres_t, _, _ = mask_decoder(
            p, "mask_decoder/core", "mask_decoder/transformer",
            emb, dense_pe(p, (4, 4)), sparse, dense,
            num_mask_tokens=4, stages=2,
        )
        lowres_t = lowres_t[..., 1:]

    np.testing.assert_allclose(
        low_exact, lowres_t.permute(0, 3, 1, 2)[0].numpy(), rtol=2e-3, atol=2e-4
    )

    # the fixed-slot default is a DOCUMENTED deviation: close, not equal
    padded = SamPredictor(model, variables, max_points=4)
    padded.set_image(image)
    _, _, low_padded = padded.predict(
        point_coords=point, point_labels=label, return_logits=True
    )
    assert np.abs(low_padded - low_exact).max() > 0  # really different paths
    assert np.abs(low_padded - low_exact).max() < 0.5  # but benign


def test_predict_batch_boxes(rng):
    model = Sam(
        img_size=64,
        num_classes=3,
        encoder_embed_dim=32,
        encoder_depth=2,
        encoder_num_heads=2,
        encoder_global_attn_indexes=(1,),
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3), jnp.float32), True, 64
    )
    predictor = SamPredictor(model, variables, max_points=4)
    image = (rng.random((48, 56, 3)) * 255).astype(np.uint8)
    predictor.set_image(image)
    boxes = np.array([[4.0, 4.0, 30.0, 28.0], [10.0, 8.0, 50.0, 40.0]])
    masks_b, iou_b, _ = predictor.predict_batch(boxes=boxes)
    assert masks_b.shape == (2, 3, 48, 56)
    # per-box sequential equality
    for i in range(2):
        m, iou, _ = predictor.predict(box=boxes[i])
        np.testing.assert_array_equal(masks_b[i], m)
        np.testing.assert_allclose(iou_b[i], iou, rtol=1e-5, atol=1e-6)
