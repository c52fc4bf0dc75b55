"""Parity tests: flax UNet vs PyTorch golden model + checkpoint import."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mia_tpu.models import UNet, UNetConfig, import_torch_unet_checkpoint
from torch_ref import TorchUNet

CHANNELS = (8, 16, 32)


def _forward_flax(variables, cfg, x_nchw, **kw):
    model = UNet(cfg)
    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    out = model.apply(variables, x, train=False, **kw)
    return np.asarray(out).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("norm", ["batch", "instance"])
@pytest.mark.parametrize("block", ["plain", "res"])
def test_unet_forward_matches_torch(rng, norm, block):
    torch.manual_seed(0)
    tm = TorchUNet(1, 4, CHANNELS, norm=norm, block=block).eval()
    x = rng.standard_normal((2, 1, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    cfg = UNetConfig(
        in_channels=1,
        out_classes=4,
        channels_list=CHANNELS,
        normalization=norm,
        block_type=block,
        dropout_prob=None,
    )
    variables = import_torch_unet_checkpoint(
        tm.state_dict(), num_levels=len(CHANNELS), block_type=block
    )
    out = _forward_flax(variables, cfg, x)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_enc_feature_matches_torch(rng):
    torch.manual_seed(1)
    tm = TorchUNet(1, 4, CHANNELS).eval()
    x = rng.standard_normal((2, 1, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref = tm.enc_feature(torch.from_numpy(x)).numpy()
    cfg = UNetConfig(
        in_channels=1, out_classes=4, channels_list=CHANNELS, dropout_prob=None
    )
    variables = import_torch_unet_checkpoint(tm.state_dict(), len(CHANNELS))
    model = UNet(cfg)
    feat = model.apply(
        variables,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
        method=UNet.enc_feature,
    )
    np.testing.assert_allclose(np.asarray(feat), ref, atol=1e-4)


def test_conv_transpose_conversion(rng):
    """flax ConvTranspose + our kernel conversion == torch ConvTranspose2d."""
    import flax.linen as nn

    torch.manual_seed(2)
    tc = torch.nn.ConvTranspose2d(6, 3, 2, 2)
    x = rng.standard_normal((1, 6, 8, 8), dtype=np.float32)
    with torch.no_grad():
        ref = tc(torch.from_numpy(x)).numpy()

    from mia_tpu.models.torch_port import _conv_transpose

    p = _conv_transpose(
        {"k.weight": tc.weight.detach().numpy(), "k.bias": tc.bias.detach().numpy()},
        "k",
    )
    m = nn.ConvTranspose(features=3, kernel_size=(2, 2), strides=(2, 2), padding="VALID")
    out = m.apply(
        {"params": {"kernel": jnp.asarray(p["kernel"]), "bias": jnp.asarray(p["bias"])}},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5
    )


@pytest.mark.parametrize("nd,shape", [(2, (3, 5, 7, 6)), (3, (2, 4, 5, 3, 6))])
def test_einsum_upsample_matches_conv_transpose(rng, nd, shape):
    """EinsumConvTranspose2x == nn.ConvTranspose(k2,s2,VALID): same params,
    same forward, same grads (it is the production decoder upsample —
    ``UNetConfig.einsum_upsample`` — chosen for MXU lane width and to avoid
    XLA's full-activation ``reverse`` in conv_transpose backward)."""
    import flax.linen as nn

    from mia_tpu.models.unet import EinsumConvTranspose2x

    x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
    ref = nn.ConvTranspose(
        features=10, kernel_size=(2,) * nd, strides=(2,) * nd, padding="VALID"
    )
    mod = EinsumConvTranspose2x(features=10, dimension=nd)
    v = ref.init(jax.random.PRNGKey(0), x)
    y0, y1 = ref.apply(v, x), mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)

    def loss(mod_, v_, x_):
        return jnp.sum(jnp.sin(mod_.apply(v_, x_)))

    g0 = jax.grad(lambda v_: loss(ref, v_, x))(v)
    g1 = jax.grad(lambda v_: loss(mod, v_, x))(v)
    for name in ("kernel", "bias"):
        np.testing.assert_allclose(
            np.asarray(g0["params"][name]),
            np.asarray(g1["params"][name]),
            atol=1e-5,
            err_msg=name,
        )
    dx0 = jax.grad(lambda x_: loss(ref, v, x_))(x)
    dx1 = jax.grad(lambda x_: loss(mod, v, x_))(x)
    np.testing.assert_allclose(np.asarray(dx0), np.asarray(dx1), atol=1e-5)


def test_deep_supervision_shapes():
    cfg = UNetConfig(
        in_channels=1,
        out_classes=3,
        channels_list=(8, 16, 32, 64),
        deep_supervision=True,
        ds_layer=3,
        dropout_prob=0.1,
    )
    model = UNet(cfg)
    x = jnp.zeros((1, 64, 64, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    outs = model.apply(variables, x, train=False, return_ds=True)
    # main head + (ds_layer - 1) aux heads, all at full resolution
    assert len(outs) == 3
    for o in outs:
        assert o.shape == (1, 64, 64, 3)


def test_dropout_is_channelwise():
    cfg = UNetConfig(in_channels=1, out_classes=2, channels_list=(8, 16), dropout_prob=0.5)
    model = UNet(cfg)
    x = jnp.ones((1, 16, 16, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    out1 = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.key(1)},
        mutable=["batch_stats"],
    )[0]
    out2 = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )[0]
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
