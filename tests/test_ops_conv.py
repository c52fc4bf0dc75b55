"""FusedBiasConv (ops/conv.py): gradient parity with stock nn.Conv.

The op's contract is exact-math equivalence with ``nn.Conv(use_bias=True)``
— same forward, same dx/dw/db — with the backward cotangent materialized
behind an optimization barrier (a measured-negative TPU experiment kept for
the record, docs/PERF.md §7). Equality is up to f32 accumulation order.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mia_tpu.models.unet import UNet, UNetConfig
from mia_tpu.ops.conv import FusedBiasConv, _safe_tap


@pytest.mark.parametrize(
    "kernel,stride,cin,cout,hw",
    [
        (3, 1, 8, 16, (20, 24)),  # block conv
        (3, 2, 8, 16, (20, 24)),  # downsample conv
        (1, 1, 16, 3, (20, 24)),  # seg head
        (1, 2, 8, 16, (20, 24)),  # residual skip conv
    ],
)
def test_grads_match_nn_conv(kernel, stride, cin, cout, hw):
    pad = (kernel - 1) // 2
    ref = nn.Conv(
        features=cout,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad),) * 2,
        use_bias=True,
    )
    fused = FusedBiasConv(
        features=cout,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad),) * 2,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, *hw, cin)), jnp.float32)
    variables = ref.init(jax.random.PRNGKey(0), x)

    def loss(mod, v, x):
        y = mod.apply(v, x)
        return jnp.sum(jnp.sin(y)), y

    (l0, y0), g0 = jax.value_and_grad(lambda v: loss(ref, v, x), has_aux=True)(variables)
    (l1, y1), g1 = jax.value_and_grad(lambda v: loss(fused, v, x), has_aux=True)(variables)
    np.testing.assert_allclose(y0, y1, rtol=1e-6, atol=1e-6)
    p0, p1 = g0["params"], g1["params"]
    np.testing.assert_allclose(p0["bias"], p1["bias"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(p0["kernel"], p1["kernel"], rtol=1e-5, atol=1e-6)


def test_dx_matches_nn_conv():
    fused = FusedBiasConv(
        features=6, kernel_size=(3, 3), strides=(1, 1), padding=((1, 1),) * 2
    )
    ref = nn.Conv(
        features=6, kernel_size=(3, 3), strides=(1, 1), padding=((1, 1),) * 2
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 12, 10, 4)), jnp.float32)
    v = ref.init(jax.random.PRNGKey(1), x)
    dx0 = jax.grad(lambda x_: jnp.sum(jnp.cos(ref.apply(v, x_))))(x)
    dx1 = jax.grad(lambda x_: jnp.sum(jnp.cos(fused.apply(v, x_))))(x)
    np.testing.assert_allclose(dx0, dx1, rtol=1e-5, atol=1e-6)


def test_safe_tap_covers_unet_cases():
    # k3/p1 s1 and s2, k1/p0 s1 and s2 all have a padding-free tap
    assert _safe_tap((3, 3), (1, 1), ((1, 1), (1, 1)), (64, 64)) == (1, 1)
    assert _safe_tap((3, 3), (2, 2), ((1, 1), (1, 1)), (64, 64)) == (1, 1)
    assert _safe_tap((1, 1), (1, 1), ((0, 0), (0, 0)), (64, 64)) == (0, 0)
    assert _safe_tap((1, 1), (2, 2), ((0, 0), (0, 0)), (64, 64)) == (0, 0)
    # k2 VALID stride 2 also has one (tap 0); k3 with no padding relies on
    # the fallback only for pathological strides
    assert _safe_tap((2, 2), (2, 2), ((0, 0), (0, 0)), (64, 64)) == (0, 0)


def test_unet_grads_match_between_conv_paths():
    """Whole-model check: UNet(fused_bias_grad=True) == UNet(False)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 3, (2, 32, 32)), jnp.int32)
    base = dict(
        in_channels=3,
        out_classes=3,
        channels_list=(8, 16, 32),
        dropout_prob=0.1,
        block_type="res",
    )
    models = [UNet(UNetConfig(**base, fused_bias_grad=f)) for f in (True, False)]
    variables = models[1].init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x,
        train=True,
    )

    def loss(model, params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x,
            train=True,
            rngs={"dropout": jax.random.PRNGKey(7)},
            mutable=["batch_stats"],
        )
        oh = jax.nn.one_hot(y, 3)
        return -jnp.mean(jax.nn.log_softmax(logits) * oh)

    g_fused = jax.grad(lambda p: loss(models[0], p))(variables["params"])
    g_plain = jax.grad(lambda p: loss(models[1], p))(variables["params"])
    flat_f = jax.tree_util.tree_leaves_with_path(g_fused)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_plain))
    for path, leaf in flat_f:
        np.testing.assert_allclose(
            leaf, flat_p[path], rtol=2e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_conv_transpose2x_pallas_matches_einsum():
    """The Pallas interleave-free k2/s2 ConvTranspose (ops/upsample2x.py,
    docs/PERF.md §21) equals the einsum lowering — outputs AND all grads —
    in interpret mode, on the SAM-upscaler-like thin-channel shapes."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from mia_tpu.models.unet import EinsumConvTranspose2x

    rng = np.random.default_rng(3)
    for (h, w, cin, cout) in [(8, 8, 32, 16), (4, 12, 16, 16), (8, 8, 64, 32)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
        ein = EinsumConvTranspose2x(cout, dimension=2, use_pallas="never")
        pal = EinsumConvTranspose2x(cout, dimension=2, use_pallas="always")
        v = ein.init(jax.random.PRNGKey(0), x)

        y_e = ein.apply(v, x)
        y_p = pal.apply(v, x)
        assert y_p.shape == (2, 2 * h, 2 * w, cout)
        np.testing.assert_allclose(y_p, y_e, rtol=1e-5, atol=1e-5)

        def loss(mod):
            def f(v, x):
                return jnp.sum(mod.apply(v, x) ** 2)

            return jax.grad(f, argnums=(0, 1))(v, x)

        (gv_e, gx_e), (gv_p, gx_p) = loss(ein), loss(pal)
        np.testing.assert_allclose(gx_p, gx_e, rtol=1e-4, atol=1e-4)
        for a, b in zip(jax.tree.leaves(gv_p), jax.tree.leaves(gv_e)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
