"""Fused LayerNorm + window-partition Pallas kernel: forward + gradient
parity vs ``window_partition(nn.LayerNorm(x))`` (interpret mode on CPU)."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from mia_tpu.models.sam.image_encoder import window_partition
from mia_tpu.ops.ln_window import ln_window_partition


def _reference(x, scale, bias, ws, eps=1e-6):
    ln = nn.LayerNorm(epsilon=eps, dtype=x.dtype)
    y = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    return window_partition(y, ws)


@pytest.mark.parametrize("h,w", [(28, 28), (32, 32), (30, 18)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ln_window_forward(rng, h, w, dtype):
    b, c, ws = 2, 256, 14
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
    scale = jnp.asarray(rng.standard_normal((c,)) * 0.2 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    out = ln_window_partition(x, scale, bias, ws, interpret=True)
    ref, _ = _reference(x, scale, bias, ws)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol,
    )


def test_ln_window_pad_slots_zero(rng):
    b, h, w, c, ws = 1, 32, 32, 128, 14
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.full((c,), 0.7, jnp.float32)  # nonzero bias must NOT leak
    out = np.asarray(ln_window_partition(x, scale, bias, ws, interpret=True))
    ref, _ = _reference(x, scale, bias, ws)
    pad_mask = np.asarray(ref) == 0.0
    assert pad_mask.any()  # 32 % 14 != 0 -> real pad slots exist
    assert (out[pad_mask] == 0.0).all()


@pytest.mark.parametrize("h,w", [(28, 28), (32, 32)])
def test_ln_window_gradients(rng, h, w):
    b, c, ws = 2, 128, 14
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((c,)) * 0.2 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    # non-uniform cotangent so pad-slot routing errors show up
    nwy = -(-h // ws)
    nwx = -(-w // ws)
    wgt = jnp.asarray(
        rng.standard_normal((b * nwy * nwx, ws, ws, c)), jnp.float32
    )

    def loss_fused(x, scale, bias):
        return jnp.sum(
            ln_window_partition(x, scale, bias, ws, interpret=True) * wgt
        )

    def loss_ref(x, scale, bias):
        return jnp.sum(_reference(x, scale, bias, ws)[0] * wgt)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5
        )


def test_ln_window_gradients_bf16(rng):
    b, h, w, c, ws = 1, 32, 32, 128, 14
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal((c,)) * 0.2 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)

    def loss_fused(x, scale, bias):
        y = ln_window_partition(x, scale, bias, ws, interpret=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_ref(x, scale, bias):
        y = _reference(x, scale, bias, ws)[0]
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    assert g_f[0].dtype == jnp.bfloat16
    for a, b_ in zip(g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=5e-2, atol=5e-2,
        )


def test_encoder_fuse_ln_window_matches_plain(rng):
    """ImageEncoderViT with the fused LN+partition kernel must match the
    plain LayerNorm→partition path — outputs, every parameter gradient,
    and an IDENTICAL parameter tree (checkpoint compatibility)."""
    from mia_tpu.models.sam.image_encoder import ImageEncoderViT

    kw = dict(
        img_size=40, patch_size=4, embed_dim=32, depth=3, num_heads=2,
        use_rel_pos=True, window_size=4, global_attn_indexes=(2,),
        out_chans=16, fused="always",
    )  # 10x10 grid, window 4 -> pad to 12 (partial edge windows)
    x = jnp.asarray(rng.standard_normal((2, 40, 40, 3)), jnp.float32)
    enc_lnw = ImageEncoderViT(fuse_ln_window="always", **kw)
    enc_plain = ImageEncoderViT(fuse_ln_window="never", **kw)
    variables = enc_plain.init(jax.random.PRNGKey(0), x)
    v2 = enc_lnw.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(
        variables
    )
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype) * 0.1,
        variables,
    )
    out_p = enc_plain.apply(variables, x)
    out_f = enc_lnw.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_p), rtol=2e-5, atol=2e-6
    )

    def loss(enc):
        return lambda v: jnp.sum(enc.apply(v, x).astype(jnp.float32) ** 2)

    gp = jax.grad(loss(enc_plain))(variables)
    gf = jax.grad(loss(enc_lnw))(variables)
    for (path, a), (_, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gp), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(gf), key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_encoder_fuse_ln_window_with_lora(rng):
    """The fused LN+partition path must compose with LoRA adapters (the
    CPC-SAM configuration)."""
    from mia_tpu.models.sam.image_encoder import ImageEncoderViT

    kw = dict(
        img_size=32, patch_size=4, embed_dim=32, depth=2, num_heads=2,
        use_rel_pos=True, window_size=4, global_attn_indexes=(1,),
        out_chans=16, fused="always", lora_rank=2,
    )
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    enc_lnw = ImageEncoderViT(fuse_ln_window="always", **kw)
    enc_plain = ImageEncoderViT(fuse_ln_window="never", **kw)
    variables = enc_plain.init(jax.random.PRNGKey(0), x)
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype) * 0.1,
        variables,
    )
    out_p = enc_plain.apply(variables, x)
    out_f = enc_lnw.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_p), rtol=2e-5, atol=2e-6
    )
