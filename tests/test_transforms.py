"""Transform parity tests vs torchvision (fixed parameters) + pipeline jit.

Random-parameter transforms are validated at distribution level (SURVEY §7
RNG-parity stance) and against torchvision with parameters pinned.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mia_tpu.transforms import (
    ComposeTransform,
    JointResize,
    MirrorTransform,
    RandomAffine,
    RandomBrightness,
    RandomContrast,
    RandomCrop2D,
    RandomGamma,
    RandomGaussianBlur,
    RandomGaussianNoise,
    RandomRotation,
    RandomRotation90,
    RandomTransform,
    SimulateLowRes,
    ZScoreNormalize,
    batch_apply,
    get_train_transform,
    zscore_normalize,
)


def _img(rng, h=32, w=32, c=1):
    return rng.random((h, w, c)).astype(np.float32)


def _lbl(rng, h=32, w=32, k=3):
    return rng.integers(0, k, (h, w)).astype(np.int32)


def test_zscore_matches_torch(rng):
    x = _img(rng)
    ours = np.asarray(zscore_normalize(jnp.asarray(x)))
    t = torch.from_numpy(np.moveaxis(x, -1, 0).copy())
    ref = ((t - t.mean()) / t.std().clip(1e-8)).numpy()
    np.testing.assert_allclose(ours, np.moveaxis(ref, 0, -1), rtol=1e-4, atol=1e-6)


def test_contrast_blend_matches_torchvision_formula(rng):
    # torchvision adjust_contrast (no torchvision in env): blend with the
    # ITU-R 601 grayscale mean, clamp [0, 1]
    x = _img(rng, c=3)
    factor = 1.17
    gray = 0.2989 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    ref = np.clip(factor * x + (1 - factor) * gray.mean(), 0.0, 1.0)
    from mia_tpu.transforms.image import _contrast_blend

    ours = np.asarray(_contrast_blend(jnp.asarray(x), factor))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_brightness_bug_compat(rng):
    """RandomBrightness applies contrast (image_transform.py:87)."""
    x = jnp.asarray(_img(rng, c=3))
    lbl = jnp.zeros((32, 32), jnp.int32)
    key = jax.random.PRNGKey(3)
    out_b, _ = RandomBrightness(0.25).apply(key, x, lbl)
    out_c, _ = RandomContrast(0.25).apply(key, x, lbl)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_c))


def _np_gaussian_blur(x_hw, sigma, kernel):
    # torchvision F.gaussian_blur: truncated normalized kernel, reflect pad
    half = (kernel - 1) / 2
    taps = np.linspace(-half, half, kernel)
    w = np.exp(-0.5 * (taps / sigma) ** 2)
    w = w / w.sum()
    pad = (kernel - 1) // 2
    xp = np.pad(x_hw, pad, mode="reflect")
    out = np.zeros_like(x_hw)
    for i in range(kernel):
        out += w[i] * xp[i : i + x_hw.shape[0], pad : pad + x_hw.shape[1]]
    out2 = np.zeros_like(out)
    xp = np.pad(out, pad, mode="reflect")
    for j in range(kernel):
        out2 += w[j] * xp[pad : pad + x_hw.shape[0], j : j + x_hw.shape[1]]
    return out2


def test_gaussian_blur_matches_golden(rng):
    x = _img(rng, 33, 31, 1)
    sigma = 0.8
    import math

    c = math.ceil(4 * sigma + 0.5)
    kernel = c if c % 2 else c - 1
    from mia_tpu.ops import gaussian_blur

    ours = np.asarray(gaussian_blur(jnp.asarray(x), sigma, kernel, max_kernel_size=9))
    ref = _np_gaussian_blur(x[..., 0], sigma, kernel)
    np.testing.assert_allclose(ours[..., 0], ref, rtol=1e-3, atol=1e-5)


def test_simulate_low_res_matches_torch(rng):
    x = _img(rng, 32, 32, 1)
    scales = (0.6, 0.8)
    from mia_tpu.ops import simulate_low_res

    ours = np.asarray(simulate_low_res(jnp.asarray(x), jnp.asarray(scales)))
    t = torch.from_numpy(np.moveaxis(x, -1, 0).copy())
    low = [int(s * i) for s, i in zip(scales, (32, 32))]
    down = torch.nn.functional.interpolate(t[None], low, mode="nearest-exact")
    ref = torch.nn.functional.interpolate(down, (32, 32), mode="bilinear")[0].numpy()
    np.testing.assert_allclose(ours, np.moveaxis(ref, 0, -1), rtol=1e-4, atol=1e-5)


def test_rotation90_and_mirror(rng):
    x = jnp.asarray(_img(rng))
    l = jnp.asarray(_lbl(rng))
    key = jax.random.PRNGKey(0)
    xi, li = RandomRotation90().apply(key, x, l)
    assert xi.shape == x.shape and li.shape == l.shape
    # k is deterministic for a fixed key: same call → same result
    xi2, li2 = RandomRotation90().apply(key, x, l)
    np.testing.assert_array_equal(np.asarray(xi), np.asarray(xi2))
    xm, lm = MirrorTransform(-1).apply(key, x, l)
    np.testing.assert_array_equal(np.asarray(xm), np.asarray(x)[:, ::-1])
    np.testing.assert_array_equal(np.asarray(lm), np.asarray(l)[:, ::-1])


def test_random_crop_shape_and_content(rng):
    x = jnp.asarray(_img(rng, 32, 32))
    l = jnp.asarray(_lbl(rng, 32, 32))
    xc, lc = RandomCrop2D(20).apply(jax.random.PRNGKey(1), x, l)
    assert xc.shape == (20, 20, 1) and lc.shape == (20, 20)
    # crop content must be a contiguous window of the source
    xs = np.asarray(x)[..., 0]
    win = np.asarray(xc)[..., 0]
    found = any(
        np.array_equal(xs[i : i + 20, j : j + 20], win)
        for i in range(13)
        for j in range(13)
    )
    assert found


def test_random_transform_gate_probability():
    x = jnp.ones((8, 8, 1), jnp.float32) * 0.5
    l = jnp.zeros((8, 8), jnp.int32)
    t = RandomTransform(RandomGamma((2.0, 2.0)), p=0.3)
    hits = 0
    n = 400
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    outs, _ = jax.jit(jax.vmap(lambda k: t.apply(k, x, l)))(keys)
    hits = int(jnp.sum(outs[:, 0, 0, 0] < 0.4))  # 0.5**2 = 0.25 when applied
    assert 0.2 * n < hits < 0.4 * n


def test_full_recipe_jits_and_runs(rng):
    imgs = jnp.asarray(rng.random((4, 32, 32, 3), np.float32))
    lbls = jnp.asarray(rng.integers(0, 3, (4, 32, 32)), jnp.int32)
    for ds in ("fugc", "acdc"):
        recipe = get_train_transform(ds)
        fn = jax.jit(lambda k, i, l: batch_apply(recipe, k, i, l))
        out_i, out_l = fn(jax.random.PRNGKey(0), imgs, lbls)
        assert out_i.shape == imgs.shape and out_l.shape == lbls.shape
        assert np.isfinite(np.asarray(out_i)).all()
        # labels stay in range
        assert set(np.unique(np.asarray(out_l))) <= {0, 1, 2}
    # params dict JSON round-trips
    import json

    json.dumps(get_train_transform("fugc").get_params_dict())


def test_joint_resize(rng):
    x = jnp.asarray(_img(rng, 48, 40))
    l = jnp.asarray(_lbl(rng, 48, 40))
    xr, lr = JointResize(32).apply(jax.random.PRNGKey(0), x, l)
    assert xr.shape == (32, 32, 1) and lr.shape == (32, 32)
    assert set(np.unique(np.asarray(lr))) <= set(np.unique(np.asarray(l)))


def test_fused_affines_matches_sequential_single_fire(rng):
    """With exactly one gate firing, the fused composition equals the plain
    gated-affine result for the same parameter draw."""
    from mia_tpu.transforms import FusedRandomAffines

    x = jnp.asarray(rng.random((32, 32, 1), np.float32))
    l = jnp.asarray(rng.integers(0, 3, (32, 32)), np.int32)
    a1 = RandomAffine(scale=(0.8, 0.8))   # deterministic params
    a2 = RandomAffine(degrees=(17.0, 17.0))

    for fire_first in (True, False):
        probs = (1.0, 0.0) if fire_first else (0.0, 1.0)
        fused = FusedRandomAffines([(a1, probs[0]), (a2, probs[1])])
        key = jax.random.PRNGKey(5)
        xf, lf = fused.apply(key, x, l)
        ref_affine = a1 if fire_first else a2
        xr, lr = ref_affine.apply(jax.random.PRNGKey(0), x, l)  # params deterministic
        if fire_first:
            # axis-aligned map: the fused two-pass warp is EXACT
            np.testing.assert_allclose(np.asarray(xf), np.asarray(xr), atol=1e-6)
            np.testing.assert_array_equal(np.asarray(lf), np.asarray(lr))
        else:
            # rotation: the two-pass warp may pick a neighbor source pixel
            # near rounding boundaries (documented) — bound the flip rate
            assert np.mean(np.asarray(xf) != np.asarray(xr)) < 0.15
            assert np.mean(np.asarray(lf) != np.asarray(lr)) < 0.15


def test_fused_affines_identity_when_no_fire(rng):
    from mia_tpu.transforms import FusedRandomAffines

    x = jnp.asarray(rng.random((16, 16, 1), np.float32))
    l = jnp.asarray(rng.integers(0, 3, (16, 16)), np.int32)
    fused = FusedRandomAffines(
        [(RandomAffine(scale=(0.7, 1.4)), 0.0), (RandomAffine(degrees=(-15, 15)), 0.0)]
    )
    xf, lf = fused.apply(jax.random.PRNGKey(0), x, l)
    np.testing.assert_array_equal(np.asarray(xf), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(l))


class TestTwopassWarp:
    def test_identity_and_axis_aligned_exact(self, rng):
        from mia_tpu.ops.warp import affine_warp, affine_warp_twopass

        img = jnp.asarray(rng.random((32, 40, 3)), jnp.float32)
        ident = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(affine_warp_twopass(img, ident)), np.asarray(img)
        )
        # axis-aligned (scale+translate, no rotation/shear): exact match
        m = jnp.asarray([[1.3, 0.0, -4.2], [0.0, 0.8, 2.5]], jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(affine_warp_twopass(img, m)),
            np.asarray(affine_warp(img, m, "nearest")),
        )

    def test_rotation_flip_rate_bounded(self, rng):
        from mia_tpu.ops.warp import (
            affine_inverse_matrix,
            affine_warp,
            affine_warp_twopass,
        )

        h = w = 64
        img = jnp.asarray(rng.random((h, w, 1)), jnp.float32)
        m = affine_inverse_matrix(
            15.0, (0.0, 0.0), 1.0, (0.0, 0.0), ((w - 1) * 0.5, (h - 1) * 0.5)
        )
        exact = np.asarray(affine_warp(img, m, "nearest"))
        fast = np.asarray(affine_warp_twopass(img, m))
        flips = np.mean(exact != fast)
        assert flips < 0.15, flips

    def test_fused_affines_label_values_preserved(self, rng):
        # integer labels must come back as exact integers through the einsum
        from mia_tpu.ops.warp import affine_inverse_matrix, affine_warp_twopass

        h = w = 48
        lbl = jnp.asarray(rng.integers(0, 4, (h, w, 1)), jnp.int32)
        m = affine_inverse_matrix(
            12.0, (0.0, 0.0), 0.9, (0.0, 0.0), ((w - 1) * 0.5, (h - 1) * 0.5)
        )
        out = np.asarray(affine_warp_twopass(lbl, m))
        assert out.dtype == np.int32
        assert set(np.unique(out)) <= {0, 1, 2, 3}


class TestPallasWarp:
    """The VMEM-resident shift+shared-map warp kernel (``ops/warp.py``):
    the production TPU path of ``FusedRandomAffines`` (docs/PERF.md)."""

    def _mat(self, angle=0.0, scale=1.0, tx=0.0, ty=0.0, hw=(256, 256)):
        from mia_tpu.ops.warp import affine_inverse_matrix

        h, w = hw
        return affine_inverse_matrix(
            jnp.float32(angle), (jnp.float32(tx), jnp.float32(ty)),
            jnp.float32(scale), (jnp.float32(0.0), jnp.float32(0.0)),
            ((w - 1) * 0.5, (h - 1) * 0.5),
        )

    def test_matches_shift2pass_bitexact(self, rng):
        # the kernel implements affine_warp_shift2pass EXACTLY (incl. the
        # mod-wrap of out-of-range shared-map indices that per-row shifts
        # bring back in range on rotations)
        from mia_tpu.ops.warp import affine_warp_pallas, affine_warp_shift2pass

        img = jnp.asarray(rng.random((256, 256, 4)), jnp.float32)
        for m in (
            self._mat(),
            self._mat(scale=0.7),
            self._mat(scale=1.4, tx=5, ty=-3),
            self._mat(angle=7.0),
            self._mat(angle=-15.0),
            self._mat(angle=15.0, scale=0.75),
        ):
            np.testing.assert_array_equal(
                np.asarray(affine_warp_pallas(img, m, interpret=True)),
                np.asarray(affine_warp_shift2pass(img, m)),
            )

    def test_axis_aligned_exact_vs_twopass(self, rng):
        from mia_tpu.ops.warp import affine_warp_shift2pass, affine_warp_twopass

        img = jnp.asarray(rng.random((256, 256, 4)), jnp.float32)
        for m in (self._mat(), self._mat(scale=0.7), self._mat(scale=1.4, tx=5)):
            np.testing.assert_array_equal(
                np.asarray(affine_warp_shift2pass(img, m)),
                np.asarray(affine_warp_twopass(img, m)),
            )

    def test_rotation_within_one_source_pixel_of_twopass(self, rng):
        # split rounding (round(a*x+c) + round(b*i) vs round(a*x+b*i+c))
        # moves the sampled source by at most one pixel per axis
        from mia_tpu.ops.warp import affine_warp_shift2pass, affine_warp_twopass

        h = w = 256
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        coord = jnp.asarray(
            np.stack([xs, ys], axis=-1).astype(np.float32)
        )  # value == source coordinate
        for m in (self._mat(angle=15.0), self._mat(angle=-15.0, scale=0.75)):
            a = np.asarray(affine_warp_shift2pass(coord, m))
            b = np.asarray(affine_warp_twopass(coord, m))
            interior = (a.sum(-1) > 0) & (b.sum(-1) > 0)  # both in-source
            d = np.abs(a - b)[interior]
            assert d.max() <= 1.0 + 1e-6, d.max()

    def test_label_values_preserved(self, rng):
        from mia_tpu.ops.warp import affine_warp_pallas

        lbl = jnp.asarray(rng.integers(0, 4, (256, 256, 4)), jnp.int32)
        out = np.asarray(
            affine_warp_pallas(lbl, self._mat(angle=12.0, scale=0.9), interpret=True)
        )
        assert out.dtype == np.int32
        assert set(np.unique(out)) <= {0, 1, 2, 3}

    def test_vmap_batches(self, rng):
        import jax

        from mia_tpu.ops.warp import affine_warp_pallas, affine_warp_shift2pass

        imgs = jnp.asarray(rng.random((3, 256, 256, 4)), jnp.float32)
        mats = jnp.stack(
            [self._mat(angle=9.0), self._mat(scale=0.8), self._mat()]
        )
        got = jax.vmap(lambda im, m: affine_warp_pallas(im, m, interpret=True))(
            imgs, mats
        )
        want = jax.vmap(affine_warp_shift2pass)(imgs, mats)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_supported_predicate(self):
        from mia_tpu.ops.warp import affine_warp_pallas_supported

        assert affine_warp_pallas_supported(256, 256, 4)
        assert not affine_warp_pallas_supported(256, 100, 4)  # lane axis
        assert not affine_warp_pallas_supported(33, 256, 4)  # sublane axis
