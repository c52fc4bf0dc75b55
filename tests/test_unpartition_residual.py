"""Fused unpartition + residual-add + norm2 Pallas kernel: forward +
gradient parity vs ``shortcut + window_unpartition(win)`` → ``LayerNorm``
(interpret mode on CPU), plus whole-encoder equality with the plain exit.
"""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from mia_tpu.models.sam.image_encoder import (
    window_partition,
    window_unpartition,
)
from mia_tpu.ops.unpartition_residual import unpartition_add_ln


def _reference(win, shortcut, scale, bias, ws, eps=1e-6):
    b, h, w, c = shortcut.shape
    pad_hw = (-(-h // ws) * ws, -(-w // ws) * ws)
    xnew = shortcut + window_unpartition(win, ws, pad_hw, (h, w))
    ln = nn.LayerNorm(epsilon=eps, dtype=shortcut.dtype)
    y = ln.apply({"params": {"scale": scale, "bias": bias}}, xnew)
    return xnew, y


def _mk(rng, b, h, w, c, ws, dtype):
    nwy, nwx = -(-h // ws), -(-w // ws)
    win = jnp.asarray(
        rng.standard_normal((b * nwy * nwx, ws, ws, c)), dtype
    )
    shortcut = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
    scale = jnp.asarray(rng.standard_normal((c,)) * 0.2 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    return win, shortcut, scale, bias


@pytest.mark.parametrize("h,w", [(28, 28), (32, 32), (30, 18)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_unpart_add_ln_forward(rng, h, w, dtype):
    b, c, ws = 2, 256, 14
    win, shortcut, scale, bias = _mk(rng, b, h, w, c, ws, dtype)
    xnew, y = unpartition_add_ln(win, shortcut, scale, bias, ws,
                                 interpret=True)
    xr, yr = _reference(win, shortcut, scale, bias, ws)
    assert xnew.shape == xr.shape and xnew.dtype == xr.dtype
    assert y.shape == yr.shape and y.dtype == yr.dtype
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(xnew, np.float32), np.asarray(xr, np.float32),
        rtol=tol, atol=tol,
    )
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(yr, np.float32),
        rtol=tol, atol=tol,
    )


def test_unpart_add_ln_ignores_pad_slots(rng):
    """Garbage in the pad window slots (what proj-on-windowed-tokens
    produces) must not reach x_new or y."""
    b, h, w, c, ws = 1, 32, 32, 128, 14
    win, shortcut, scale, bias = _mk(rng, b, h, w, c, ws, jnp.float32)
    # poison the pad slots: partition a ones-grid, zero slots are pads
    marker, _ = window_partition(jnp.ones((b, h, w, c), jnp.float32), ws)
    poisoned = jnp.where(marker == 0.0, 1e30, win)
    x1, y1 = unpartition_add_ln(win, shortcut, scale, bias, ws,
                                interpret=True)
    x2, y2 = unpartition_add_ln(poisoned, shortcut, scale, bias, ws,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


@pytest.mark.parametrize("h,w", [(28, 28), (32, 32)])
def test_unpart_add_ln_gradients(rng, h, w):
    b, c, ws = 2, 128, 14
    win, shortcut, scale, bias = _mk(rng, b, h, w, c, ws, jnp.float32)
    # distinct cotangents for BOTH outputs so the dual-use VJP is covered
    wx = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    wy = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)

    def loss_fused(win, shortcut, scale, bias):
        xnew, y = unpartition_add_ln(win, shortcut, scale, bias, ws,
                                     interpret=True)
        return jnp.sum(xnew * wx) + jnp.sum(y * wy)

    def loss_ref(win, shortcut, scale, bias):
        xnew, y = _reference(win, shortcut, scale, bias, ws)
        return jnp.sum(xnew * wx) + jnp.sum(y * wy)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(win, shortcut, scale, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(win, shortcut, scale, bias)
    # pad-slot cotangents must be exactly zero (the unpartition slice VJP)
    marker, _ = window_partition(jnp.ones((b, h, w, c), jnp.float32), ws)
    assert (np.asarray(g_f[0])[np.asarray(marker) == 0.0] == 0.0).all()
    for a, b_ in zip(g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5
        )


def test_unpart_add_ln_gradients_bf16(rng):
    b, h, w, c, ws = 1, 32, 32, 128, 14
    win, shortcut, scale, bias = _mk(rng, b, h, w, c, ws, jnp.bfloat16)

    def loss_fused(win, shortcut, scale, bias):
        xnew, y = unpartition_add_ln(win, shortcut, scale, bias, ws,
                                     interpret=True)
        return jnp.sum(xnew.astype(jnp.float32) ** 2) + jnp.sum(
            y.astype(jnp.float32) ** 2
        )

    def loss_ref(win, shortcut, scale, bias):
        xnew, y = _reference(win, shortcut, scale, bias, ws)
        return jnp.sum(xnew.astype(jnp.float32) ** 2) + jnp.sum(
            y.astype(jnp.float32) ** 2
        )

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(win, shortcut, scale, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(win, shortcut, scale, bias)
    assert g_f[0].dtype == jnp.bfloat16 and g_f[1].dtype == jnp.bfloat16
    for a, b_ in zip(g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=5e-2, atol=5e-2,
        )


def test_encoder_fuse_unpart_residual_matches_plain(rng):
    """ImageEncoderViT with the fused exit kernel must match the plain
    unpartition → add → norm2 path — outputs, every parameter gradient,
    and an IDENTICAL parameter tree (checkpoint compatibility). Both arms
    run the fused LN+partition entry so only the exit differs."""
    from mia_tpu.models.sam.image_encoder import ImageEncoderViT

    kw = dict(
        img_size=40, patch_size=4, embed_dim=32, depth=3, num_heads=2,
        use_rel_pos=True, window_size=4, global_attn_indexes=(2,),
        out_chans=16, fused="always", fuse_ln_window="always",
    )  # 10x10 grid, window 4 -> pad to 12 (partial edge windows)
    x = jnp.asarray(rng.standard_normal((2, 40, 40, 3)), jnp.float32)
    enc_f = ImageEncoderViT(fuse_unpart_residual="always", **kw)
    enc_p = ImageEncoderViT(fuse_unpart_residual="never", **kw)
    variables = enc_p.init(jax.random.PRNGKey(0), x)
    v2 = enc_f.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(
        variables
    )
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype) * 0.1,
        variables,
    )
    out_p = enc_p.apply(variables, x)
    out_f = enc_f.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_p), rtol=2e-5, atol=2e-6
    )

    def loss(enc):
        return lambda v: jnp.sum(enc.apply(v, x).astype(jnp.float32) ** 2)

    gp = jax.grad(loss(enc_p))(variables)
    gf = jax.grad(loss(enc_f))(variables)
    for (path, a), (_, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gp), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(gf), key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )
