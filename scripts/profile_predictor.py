"""Attribute SamPredictor.set_image / predict latency end-to-end.

Breaks the serving path (VERDICT r3 weak #1) into its host/transfer/device
stages the way docs/PERF.md §7/§13 profiled the train loop:

- tunnel round-trip latency (fetch of a ready scalar)
- H2D bandwidth (f32 vs uint8 image payloads)
- D2H bandwidth (f32 vs bool mask payloads)
- host ResizeLongestSide time
- embed program device time (timed via scalar-fetch fence)
- decoder program device time
- eager postprocess_masks dispatch cost
- full set_image / predict as shipped

Run on the TPU tunnel: ``python scripts/profile_predictor.py``.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, iters=10, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters * 1e3


def fence(x):
    """Force completion through the tunnel (block_until_ready is async there)."""
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    from mia_tpu.models.sam.build_sam import sam_model_registry
    from mia_tpu.models.sam.predictor import SamPredictor
    from mia_tpu.utils import maybe_enable_compilation_cache

    maybe_enable_compilation_cache()

    print("devices:", jax.devices())

    # --- tunnel characteristics -------------------------------------------
    one = jnp.zeros(())
    fence(one)
    print(f"rtt scalar fetch        : {timeit(lambda: fence(one), 20):8.2f} ms")

    for nbytes, name in ((512 * 512 * 3 * 4, "f32 3MB"), (512 * 512 * 3, "u8 768KB")):
        host = np.zeros(nbytes, np.uint8)

        def h2d():
            d = jax.device_put(host)
            fence(d[:1])

        print(f"H2D {name:14s}     : {timeit(h2d, 10):8.2f} ms")

    dev_f32 = jnp.zeros((512, 512, 3), jnp.float32)
    dev_b = jnp.zeros((512, 512, 3), jnp.bool_)
    dev_lr = jnp.zeros((128, 128, 3), jnp.float32)
    fence(dev_f32)
    print(f"D2H f32 3MB mask        : {timeit(lambda: np.asarray(dev_f32), 10):8.2f} ms")
    print(f"D2H bool 768KB mask     : {timeit(lambda: np.asarray(dev_b), 10):8.2f} ms")
    print(f"D2H f32 196KB lowres    : {timeit(lambda: np.asarray(dev_lr), 10):8.2f} ms")

    # --- model -------------------------------------------------------------
    model, _ = sam_model_registry["vit_b"](
        image_size=512, num_classes=1, compute_dtype=jnp.bfloat16
    )
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (512, 512, 3), np.uint8)
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 512, 512, 3), jnp.float32),
                True,
                512,
            )
        ),
    )
    predictor = SamPredictor(model, variables)

    # host transform
    t = timeit(lambda: predictor.transform.apply_image(image), 10)
    print(f"host ResizeLongestSide  : {t:8.2f} ms")

    # embed program: device time with input already on device
    x_dev = jnp.asarray(predictor.transform.apply_image(image), jnp.float32)[None]
    fence(x_dev)
    feats = predictor._embed_program(variables, x_dev)
    fence(feats)

    def embed_device():
        f = predictor._embed_program(variables, x_dev)
        fence(f)

    print(f"embed program (dev in)  : {timeit(embed_device, 10):8.2f} ms")

    # full set_image as shipped
    predictor.set_image(image)

    def set_image_full():
        predictor.set_image(image)
        fence(predictor.features)

    print(f"set_image FULL          : {timeit(set_image_full, 10):8.2f} ms")

    # decoder program alone (device-resident inputs, no postprocess)
    pts = np.array([[256.0, 256.0], [128.0, 300.0]], np.float32)
    lbl = np.array([1, 1], np.int32)
    coords = np.zeros((1, 16, 2), np.float32)
    labels = -np.ones((1, 16), np.int32)
    coords[0, :2] = predictor.transform.apply_coords(pts, (512, 512))
    labels[0, :2] = lbl
    coords_d = jnp.asarray(coords)
    labels_d = jnp.asarray(labels)
    boxes_d = jnp.zeros((1, 4), jnp.float32)
    masks_d = jnp.zeros((1, 128, 128, 1), jnp.float32)
    program = predictor._decoder_program(False, False, True)
    lr, iou = program(variables, feats, coords_d, labels_d, boxes_d, masks_d)
    fence(lr)

    def decode_device():
        lr, iou = program(variables, feats, coords_d, labels_d, boxes_d, masks_d)
        fence(lr)

    print(f"decoder program (dev in): {timeit(decode_device, 10):8.2f} ms")

    # eager postprocess dispatch cost
    from mia_tpu.models.sam.sam import postprocess_masks

    def post_eager():
        m = postprocess_masks(lr, 512, (512, 512), (512, 512))
        fence(m)

    print(f"postprocess eager       : {timeit(post_eager, 10):8.2f} ms")

    # full predict as shipped
    predictor.predict(point_coords=pts, point_labels=lbl)
    print(
        f"predict FULL            : "
        f"{timeit(lambda: predictor.predict(point_coords=pts, point_labels=lbl), 10):8.2f} ms"
    )


if __name__ == "__main__":
    main()
