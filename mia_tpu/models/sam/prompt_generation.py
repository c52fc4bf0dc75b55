"""Device-side prompt self-generation for CPC-SAM.

The reference's ``prompt_generate_random_fast``
(``sam_dualmask_same_prompt_class_random_large.py:508-645``) leaves the
device EVERY training iteration: pseudo-label → ``.cpu().numpy()`` →
skimage connected components + ``cv2.distanceTransform`` + numpy randint →
back to device tensors. Here the whole thing is ONE jitted program built on
``mia_tpu.ops``: iterative CC labeling, exact EDT, and Gumbel-style random
tie-breaking draws — no host sync in the hot loop.

Fixed-shape deviation (documented): the reference samples a per-class point
COUNT in ``[n0, n1]``, which changes tensor shapes per step. Here every
class always gets ``n1`` point slots; a per-step random count masks the
extras by REPEATING the first point of the class (duplicate points are how
the reference itself pads missing classes, ``:602-611``). Distribution-level
parity per SURVEY §7's RNG stance.

Reference-bug parity: ``boxes_label`` is never assigned the class id
(``:536, 654``), so box prompts always use class-0 corner embeddings —
preserved.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...ops import resize
from ...ops.distance import squared_edt
from ...ops.morphology import component_sizes_and_largest


def _random_index_2d(rng, score: jnp.ndarray, k: int):
    """k draws (with replacement) uniform over argmax pixels of ``score``.

    Mirrors ``np.random.randint(0, len(argwhere(score == max)))`` by
    sampling a categorical over the tied maxima.
    """
    flat = score.reshape(-1)
    is_max = flat >= jnp.max(flat)
    logits = jnp.where(is_max, 0.0, -1e30)
    idx = jax.random.categorical(rng, logits, shape=(k,))
    w = score.shape[1]
    ys = idx // w
    xs = idx % w
    return jnp.stack([xs, ys], axis=1).astype(jnp.float32)  # (k, 2) as (x, y)


def _random_in_mask(rng, mask: jnp.ndarray, k: int):
    flat = mask.reshape(-1).astype(jnp.float32)
    logits = jnp.where(flat > 0, 0.0, -1e30)
    idx = jax.random.categorical(rng, logits, shape=(k,))
    w = mask.shape[1]
    return jnp.stack([idx % w, idx // w], axis=1).astype(jnp.float32)


def _distance_to_zero(binary: jnp.ndarray) -> jnp.ndarray:
    """cv2.distanceTransform semantics on a zero-padded mask (``:580-589``)."""
    padded = jnp.pad(binary > 0, 1)
    dist2 = squared_edt(~padded)
    return jnp.sqrt(jnp.maximum(dist2, 0.0))[1:-1, 1:-1] * (binary > 0)


def _jittered_bbox(rng, binary: jnp.ndarray, max_change_rate: float):
    """Largest-region bbox with random outward jitter (``_get_bbox``,
    ``:494-507``). Returns ((x1, y1), (x2, y2)) float."""
    h, w = binary.shape
    any_row = jnp.any(binary > 0, axis=1)
    any_col = jnp.any(binary > 0, axis=0)
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    y1 = jnp.min(jnp.where(any_row, ys, h)).astype(jnp.float32)
    y2 = jnp.max(jnp.where(any_row, ys, -1)).astype(jnp.float32)
    x1 = jnp.min(jnp.where(any_col, xs, w)).astype(jnp.float32)
    x2 = jnp.max(jnp.where(any_col, xs, -1)).astype(jnp.float32)

    rx1, rx2, ry1, ry2 = jax.random.split(rng, 4)
    fx = jnp.floor((x2 - x1) * max_change_rate)
    fy = jnp.floor((y2 - y1) * max_change_rate)
    # np.random.randint(-c, 1) / (0, c+1) with traced bounds via uniform floor
    def randint(key, lo, hi):  # [lo, hi) with traced bounds
        u = jax.random.uniform(key)
        return jnp.floor(lo + u * (hi - lo))

    x1j = jnp.clip(x1 + randint(rx1, -fx, 1.0), 0, w - 1)
    x2j = jnp.clip(x2 + randint(rx2, 0.0, fx + 1.0), 0, w - 1)
    y1j = jnp.clip(y1 + randint(ry1, -fy, 1.0), 0, h - 1)
    y2j = jnp.clip(y2 + randint(ry2, 0.0, fy + 1.0), 0, h - 1)
    return jnp.stack([jnp.stack([x1j, y1j]), jnp.stack([x2j, y2j])])


def prompt_generate_random_fast(
    rng: jax.Array,
    coarse_probs: jnp.ndarray,
    image_size: int,
    mask_input_size: Tuple[int, int],
    num_points_prompt: Tuple[int, int] = (1, 2),
    bbox_change_rate: Tuple[float, float] = (0.1, 0.2),
    israndom: bool = True,
    compute_at_native: bool = False,
    max_compute_size: int = 128,
):
    """coarse_probs (B, h, w, C) → prompts at ``image_size`` resolution.

    Returns (points, points_random, fit_boxes, loose_boxes, mask_prompt)
    with points = (coords (B, P, 2), labels (B, P)), boxes =
    (coords (B, C-1, 2, 2), labels (B, C-1)), mask_prompt (B, Hm, Wm, 1).

    Performance (documented deviation): by default the connected-components
    / EDT / bbox machinery runs at a capped ``max_compute_size`` resolution
    (nearest-downsampling the pseudo-label when needed) and the resulting
    coordinates are scaled into the ``image_size`` frame. The reference
    runs it at the full image size (``sam_dualmask...py:513-519``) — the
    dual-mask decoders emit FULL-resolution pseudo-labels, so at 512² that
    is 16× the CC/EDT work for prompt positions that are random-jittered
    anyway (measured: those while-loops were 86% of the phase-2 train
    step). Point/box positions agree with the native path up to the
    downsample factor (≤ 4 px at 512), within the generator's own jitter.
    Pass ``compute_at_native=True`` for the reference's exact positions.
    """
    b, h, w, num_class = coarse_probs.shape
    max_pts = num_points_prompt[1]
    total = num_class * max_pts

    pred = jnp.argmax(coarse_probs, axis=-1).astype(jnp.int32)
    if compute_at_native:
        compute = image_size
    else:
        compute = min(h, image_size, max_compute_size)
    scale = image_size / compute
    if (h, w) != (compute, compute):
        pred = resize(pred[..., None], (compute, compute), "nearest")[..., 0]

    def one_image(rng, pred_i):
        keys = jax.random.split(rng, num_class * 4 + 1)
        count_key = keys[-1]
        # per-class active point count in [n0, n1]
        counts = jax.random.randint(
            count_key, (num_class,), num_points_prompt[0], num_points_prompt[1] + 1
        )

        # per-class device machinery runs VMAPPED over classes: one CC
        # while-loop / EDT program per image instead of num_class of them
        # (the per-program fixed costs dominated the phase-2 profile)
        cls_ids = jnp.arange(num_class, dtype=jnp.int32)
        masks = (pred_i[None] == cls_ids[:, None, None]).astype(jnp.int32)
        has_any = jnp.sum(masks, axis=(1, 2)) > 0  # (C,)

        def largest_of(mask):
            # capped sweeps: prompt positions only need A blob of the class,
            # and the classes run vmapped in lockstep — an uncapped
            # while-loop would make every class pay for the worst one
            # (speckled backgrounds from early-training pseudo-labels).
            # Fragments of an under-merged component still lie inside the
            # class mask, so prompts stay valid; clean (trained) masks
            # converge in far fewer sweeps than the cap.
            _, _, largest = component_sizes_and_largest(mask, max_iters=16)
            return largest.astype(jnp.int32)

        largest = jax.vmap(largest_of)(masks)  # (C, H, W)
        dists = jax.vmap(_distance_to_zero)(largest)

        k_centers = keys[0 : num_class * 4 : 4]
        k_rands = keys[1 : num_class * 4 : 4]
        k_fits = keys[2 : num_class * 4 : 4]
        k_looses = keys[3 : num_class * 4 : 4]

        centers = jax.vmap(lambda k, d: _random_index_2d(k, d, max_pts))(
            k_centers, dists
        )  # (C, P, 2)
        randoms = jax.vmap(lambda k, m: _random_in_mask(k, m, max_pts))(
            k_rands, largest
        )

        # inactive slots (beyond the sampled count) repeat the first point
        active = jnp.arange(max_pts)[None, :] < counts[:, None]  # (C, P)
        centers = jnp.where(active[..., None], centers, centers[:, :1])
        randoms = jnp.where(active[..., None], randoms, randoms[:, :1])

        # empty-class fallback: reuse class-0's first center (":602-611")
        class0_first = centers[0, 0]
        centers = jnp.where(has_any[:, None, None], centers, class0_first)
        randoms = jnp.where(has_any[:, None, None], randoms, class0_first)
        label_vals = jnp.where(has_any & (cls_ids > 0), cls_ids, 0)  # (C,)
        labels = jnp.broadcast_to(label_vals[:, None], (num_class, max_pts))

        fit_all = jax.vmap(
            lambda k, m: _jittered_bbox(k, m, bbox_change_rate[0])
        )(k_fits, largest)  # (C, 2, 2)
        loose_all = jax.vmap(
            lambda k, m: _jittered_bbox(k, m, bbox_change_rate[1])
        )(k_looses, largest)
        fallback = jnp.stack([class0_first, class0_first])  # degenerate box
        fit_all = jnp.where(has_any[:, None, None], fit_all, fallback)
        loose_all = jnp.where(has_any[:, None, None], loose_all, fallback)

        points = centers.reshape(total, 2)
        points_r = randoms.reshape(total, 2)
        labels = labels.reshape(total).astype(jnp.int32)
        return points, points_r, labels, fit_all[1:], loose_all[1:]

    keys = jax.random.split(rng, b)
    points, points_r, labels, fit, loose = jax.vmap(one_image)(keys, pred)

    if scale != 1.0:
        # coarse pixel (x, y) covers fine pixels [x·s, x·s+s): points map to
        # the cell center, box corners to the cell's outer edges
        s = jnp.float32(scale)
        half = (s - 1.0) * 0.5
        points = jnp.clip(jnp.floor(points * s + half), 0, image_size - 1)
        points_r = jnp.clip(jnp.floor(points_r * s + half), 0, image_size - 1)

        def scale_boxes(boxes):
            lo = boxes[:, :, 0] * s
            hi = boxes[:, :, 1] * s + (s - 1.0)
            return jnp.clip(
                jnp.stack([lo, hi], axis=2), 0, image_size - 1
            )

        fit = scale_boxes(fit)
        loose = scale_boxes(loose)

    box_labels = jnp.zeros((b, num_class - 1), jnp.int32)  # reference bug parity
    mask_prompt = resize(
        pred[..., None].astype(jnp.float32), tuple(mask_input_size), "nearest"
    )

    points_prompt = (points, labels)
    points_prompt_random = (points_r, labels)
    fit_boxes_prompt = (fit, box_labels)
    loose_boxes_prompt = (loose, box_labels)
    if israndom:
        return (
            points_prompt,
            points_prompt_random,
            fit_boxes_prompt,
            loose_boxes_prompt,
            mask_prompt,
        )
    return points_prompt, fit_boxes_prompt, mask_prompt
