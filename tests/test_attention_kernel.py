"""Fused-attention Pallas kernel: forward + gradient parity vs einsum
(interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mia_tpu.ops.attention import attention_with_padding, fused_attention


def _reference(q, k, v, bias, scale):
    s = jnp.einsum("bqd,bkd->bqk", q * scale, k) + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v)


@pytest.mark.parametrize("n,block_q", [(128, 128), (256, 128)])
def test_fused_attention_forward(rng, n, block_q):
    bh, d = 4, 32
    q = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((bh, n, n)), jnp.float32)
    out = fused_attention(q, k, v, bias, 0.125, block_q, True)
    ref = _reference(q, k, v, bias, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_attention_padding_masks_keys(rng):
    # N=100 pads to 128; padded keys must not contribute
    bh, n, d = 2, 100, 16
    q = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    bias = jnp.zeros((bh, n, n), jnp.float32)
    out = attention_with_padding(q, k, v, bias, 0.25)
    ref = _reference(q, k, v, bias, 0.25)
    assert out.shape == (bh, n, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_attention_gradients(rng):
    bh, n, d = 2, 128, 16
    q = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((bh, n, n)), jnp.float32) * 0.1

    def loss_fused(q, k, v, bias):
        return jnp.sum(fused_attention(q, k, v, bias, 0.125, 128, True) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(_reference(q, k, v, bias, 0.125) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_vit_attention_fused_matches_einsum(rng):
    from mia_tpu.models.sam.image_encoder import Attention

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)
    attn_e = Attention(dim=32, num_heads=2, use_rel_pos=True, input_size=(8, 8), fused="never")
    variables = attn_e.init(jax.random.PRNGKey(0), x)
    out_e = attn_e.apply(variables, x)
    attn_f = Attention(dim=32, num_heads=2, use_rel_pos=True, input_size=(8, 8), fused="always")
    out_f = attn_f.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e), rtol=1e-4, atol=1e-5)


def test_fused_rel_attention_matches_dense_bias(rng):
    from mia_tpu.ops.attention import attention_rel_with_padding

    bh, k_h, k_w, d = 3, 10, 12, 16
    n = k_h * k_w  # 120 -> pads to 128
    q = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    rel_h = jnp.asarray(rng.standard_normal((bh, n, k_h)), jnp.float32) * 0.2
    rel_w = jnp.asarray(rng.standard_normal((bh, n, k_w)), jnp.float32) * 0.2

    out = attention_rel_with_padding(q, k, v, rel_h, rel_w, 0.25, (k_h, k_w))
    bias = (rel_h[:, :, :, None] + rel_w[:, :, None, :]).reshape(bh, n, n)
    ref = _reference(q, k, v, bias, 0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_rel_attention_gradients(rng):
    from mia_tpu.ops.attention import fused_attention_rel

    bh, k_h, k_w, d = 2, 8, 16, 8
    n = k_h * k_w  # 128
    q = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    rel_h = jnp.asarray(rng.standard_normal((bh, n, k_h)), jnp.float32) * 0.2
    rel_w = jnp.asarray(rng.standard_normal((bh, n, k_w)), jnp.float32) * 0.2

    def loss_fused(q, k, v, rh, rw):
        return jnp.sum(fused_attention_rel(q, k, v, rh, rw, 0.25, (k_h, k_w), 128, True) ** 2)

    def loss_ref(q, k, v, rh, rw):
        bias = (rh[:, :, :, None] + rw[:, :, None, :]).reshape(bh, n, n)
        return jnp.sum(_reference(q, k, v, bias, 0.25) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, rel_h, rel_w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, rel_h, rel_w)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_fused_rel_attention_gradients_unaligned(rng):
    """SAM window shape: n=196 not block-aligned — exercises the in-kernel
    OOB masking of the no-HBM-padding path (fwd + all five grads)."""
    from mia_tpu.ops.attention import fused_attention_rel

    bh, k_h, k_w, d = 2, 14, 14, 8
    n = k_h * k_w  # 196 -> one partial 256-block
    q = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    rel_h = jnp.asarray(rng.standard_normal((bh, n, k_h)), jnp.float32) * 0.2
    rel_w = jnp.asarray(rng.standard_normal((bh, n, k_w)), jnp.float32) * 0.2

    def loss_fused(q, k, v, rh, rw):
        return jnp.sum(fused_attention_rel(q, k, v, rh, rw, 0.25, (k_h, k_w), None, True) ** 2)

    def loss_ref(q, k, v, rh, rw):
        bias = (rh[:, :, :, None] + rw[:, :, None, :]).reshape(bh, n, n)
        return jnp.sum(_reference(q, k, v, bias, 0.25) ** 2)

    out = fused_attention_rel(q, k, v, rel_h, rel_w, 0.25, (k_h, k_w), None, True)
    bias = (rel_h[:, :, :, None] + rel_w[:, :, None, :]).reshape(bh, n, n)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_reference(q, k, v, bias, 0.25)),
        rtol=1e-4, atol=1e-5,
    )
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, rel_h, rel_w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, rel_h, rel_w)
    for a, b in zip(gf, gr):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize(
    "hw,ws,dim,heads",
    [
        ((10, 9), 4, 16, 2),   # pad rows AND cols (grid-edge bias fill)
        ((8, 8), 4, 16, 2),    # exact tiling, no padding
        ((12, 12), 4, 24, 3),  # head group != power of two
    ],
)
def test_windowed_attention_matches_einsum(rng, hw, ws, dim, heads):
    """Grid-native windowed kernel vs the reference einsum path through the
    full Attention module: fwd + every parameter gradient — including the
    qkv BIAS gradient, which receives the pad-window-slot dk/dv that the
    partition-first formulation routes through the Dense."""
    from mia_tpu.models.sam.image_encoder import Attention

    h, w = hw
    x = jnp.asarray(rng.standard_normal((2, h, w, dim)), jnp.float32)
    kw = dict(dim=dim, num_heads=heads, use_rel_pos=True,
              input_size=(ws, ws), window_size=ws)
    attn_e = Attention(fused="never", **kw)
    variables = attn_e.init(jax.random.PRNGKey(0), x)
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype) * 0.1,
        variables,
    )
    attn_f = Attention(fused="always", **kw)
    out_e = attn_e.apply(variables, x)
    out_f = attn_f.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_e), rtol=1e-4, atol=1e-5
    )

    def loss(fn):
        return lambda v: jnp.sum(fn.apply(v, x).astype(jnp.float32) ** 2)

    ge = jax.grad(loss(attn_e))(variables)
    gf = jax.grad(loss(attn_f))(variables)
    flat_e = sorted(
        jax.tree_util.tree_leaves_with_path(ge), key=lambda t: str(t[0])
    )
    flat_f = sorted(
        jax.tree_util.tree_leaves_with_path(gf), key=lambda t: str(t[0])
    )
    for (path, a), (_, b) in zip(flat_e, flat_f):
        assert np.isfinite(np.asarray(b)).all(), path
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_windowed_attention_gate(rng, monkeypatch):
    """Configs the windowed kernel cannot tile fall back cleanly: window
    larger than the grid uses the partition path, and the availability
    predicate answers without raising."""
    from mia_tpu.models.sam.image_encoder import Attention
    from mia_tpu.ops.attention import windowed_attention_available

    monkeypatch.setenv("MIA_WINDOWED_ATTN", "1")
    assert not windowed_attention_available(2, 8, 14, 8, 8, 2, False)
    assert windowed_attention_available(12, 64, 14, 32, 32, 2, False)

    # window 14 over an 8x8 grid -> single padded window via partition path
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32)
    kw = dict(dim=16, num_heads=2, use_rel_pos=True,
              input_size=(14, 14), window_size=14)
    attn_e = Attention(fused="never", **kw)
    variables = attn_e.init(jax.random.PRNGKey(0), x)
    out_e = attn_e.apply(variables, x)
    out_f = Attention(fused="always", **kw).apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_e), rtol=1e-4, atol=1e-5
    )


def test_shared_window_run_matches_per_block_partition(rng):
    """A run of consecutive windowed blocks under ONE shared partition
    (pads re-zeroed per block) must match the per-block partition path
    exactly — outputs and every parameter gradient."""
    from mia_tpu.models.sam.image_encoder import ImageEncoderViT

    kw = dict(
        img_size=40, patch_size=4, embed_dim=32, depth=3, num_heads=2,
        use_rel_pos=True, window_size=4, global_attn_indexes=(2,),
        out_chans=16,
    )  # blocks 0,1 windowed (10x10 grid, pad to 12) -> one shared run
    x = jnp.asarray(rng.standard_normal((2, 40, 40, 3)), jnp.float32)
    enc_shared = ImageEncoderViT(share_window_runs=True, **kw)
    enc_plain = ImageEncoderViT(share_window_runs=False, **kw)
    variables = enc_plain.init(jax.random.PRNGKey(0), x)
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype) * 0.1,
        variables,
    )
    out_p = enc_plain.apply(variables, x)
    out_s = enc_shared.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_p), rtol=1e-5, atol=1e-6
    )

    def loss(enc):
        return lambda v: jnp.sum(enc.apply(v, x).astype(jnp.float32) ** 2)

    gp = jax.grad(loss(enc_plain))(variables)
    gs = jax.grad(loss(enc_shared))(variables)
    for (path, a), (_, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gp), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(gs), key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_headmajor_fallback_when_no_packed_tiling(rng, monkeypatch):
    """On TPU, tiny head configs (e.g. heads=2, head_dim=16) have NO packed
    lane tiling (no G with G*D % 128 == 0) — the encoder must fall back to
    the head-major fused path instead of raising (advisor finding r2)."""
    import mia_tpu.models.sam.image_encoder as enc_mod
    from mia_tpu.ops.attention import packed_attention_available

    assert not packed_attention_available(2, 16, interpret=False)

    # force both the windowed and packed paths off so the fallback runs
    monkeypatch.setattr(
        "mia_tpu.ops.attention.windowed_attention_available",
        lambda *a, **k: False,
    )
    monkeypatch.setattr(
        "mia_tpu.ops.attention.packed_attention_available",
        lambda *a, **k: False,
    )
    x = jnp.asarray(rng.standard_normal((1, 10, 9, 32)), jnp.float32)
    kw = dict(dim=32, num_heads=2, use_rel_pos=True,
              input_size=(4, 4), window_size=4)
    attn_e = enc_mod.Attention(fused="never", **kw)
    variables = attn_e.init(jax.random.PRNGKey(0), x)
    out_e = attn_e.apply(variables, x)
    out_f = enc_mod.Attention(fused="always", **kw).apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_e), rtol=1e-4, atol=1e-5
    )


def test_fused_rel_packed_matches_headmajor(rng):
    """Packed (B, N, 3HD) kernel vs the head-major kernel and the dense-bias
    einsum, fwd + grads, at an unaligned window shape."""
    from mia_tpu.ops.attention import fused_attention_rel_packed

    b, heads, k_h, k_w, d = 2, 3, 10, 12, 8
    n = k_h * k_w  # 120, unaligned
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * heads * d)), jnp.float32)
    rel_h = jnp.asarray(rng.standard_normal((b * heads, n, k_h)), jnp.float32) * 0.2
    rel_w = jnp.asarray(rng.standard_normal((b * heads, n, k_w)), jnp.float32) * 0.2

    def ref(qkv, rel_h, rel_w):
        q3 = qkv.reshape(b, n, 3, heads, d)
        q = q3[:, :, 0].transpose(0, 2, 1, 3).reshape(b * heads, n, d)
        k = q3[:, :, 1].transpose(0, 2, 1, 3).reshape(b * heads, n, d)
        v = q3[:, :, 2].transpose(0, 2, 1, 3).reshape(b * heads, n, d)
        bias = (rel_h[:, :, :, None] + rel_w[:, :, None, :]).reshape(b * heads, n, n)
        out = _reference(q, k, v, bias, 0.25)  # (BH, N, D)
        return out.reshape(b, heads, n, d).transpose(0, 2, 1, 3).reshape(b, n, heads * d)

    out = fused_attention_rel_packed(qkv, rel_h, rel_w, 0.25, (k_h, k_w), heads, None, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref(qkv, rel_h, rel_w)), rtol=1e-4, atol=1e-5
    )

    def loss_f(qkv, rh, rw):
        return jnp.sum(
            fused_attention_rel_packed(qkv, rh, rw, 0.25, (k_h, k_w), heads, None, True) ** 2
        )

    def loss_r(qkv, rh, rw):
        return jnp.sum(ref(qkv, rh, rw) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(qkv, rel_h, rel_w)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(qkv, rel_h, rel_w)
    for a, b_ in zip(gf, gr):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize(
    "k_hw,b,heads,d,block_q",
    [
        ((8, 16), 2, 4, 32, 128),   # aligned single q-block
        ((14, 14), 2, 2, 64, 128),  # SAM window: n=196, TWO q-blocks (accum)
        ((14, 14), 3, 4, 32, None), # auto block_q, 3 batches (grid revisit)
    ],
)
def test_packed_ik_matches_packed_with_external_rel(rng, k_hw, b, heads, d,
                                                    block_q):
    """In-kernel-rel packed kernel vs the packed kernel fed the SAME rel
    terms computed by the external einsum — fwd, dqkv, and BOTH rel-table
    gradients (the in-kernel candidate matmul + one-hot select/scatter must
    be exactly the einsum's math)."""
    from mia_tpu.ops.attention import (
        fused_attention_rel_packed,
        fused_attention_rel_packed_ik,
    )

    k_h, k_w = k_hw
    n = k_h * k_w
    hd = heads * d
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * hd)), jnp.float32)
    rhf = jnp.asarray(rng.standard_normal((k_h * k_h, d)), jnp.float32) * 0.2
    rwf = jnp.asarray(rng.standard_normal((k_w * k_w, d)), jnp.float32) * 0.2

    def external(qkv, rhf, rwf):
        q5 = qkv[..., :hd].reshape(b, k_h, k_w, heads, d)
        rel_h = jnp.einsum(
            "byxhc,ykc->bhyxk", q5, rhf.reshape(k_h, k_h, d)
        ).reshape(b * heads, n, k_h)
        rel_w = jnp.einsum(
            "byxhc,xkc->bhyxk", q5, rwf.reshape(k_w, k_w, d)
        ).reshape(b * heads, n, k_w)
        return fused_attention_rel_packed(
            qkv, rel_h, rel_w, 0.25, (k_h, k_w), heads, block_q, True
        )

    def inkernel(qkv, rhf, rwf):
        return fused_attention_rel_packed_ik(
            qkv, rhf, rwf, 0.25, (k_h, k_w), heads, block_q, True
        )

    out_e = external(qkv, rhf, rwf)
    out_i = inkernel(qkv, rhf, rwf)
    np.testing.assert_allclose(
        np.asarray(out_i), np.asarray(out_e), rtol=1e-4, atol=1e-5
    )

    ge = jax.grad(lambda *a: jnp.sum(external(*a) ** 2), argnums=(0, 1, 2))(
        qkv, rhf, rwf
    )
    gi = jax.grad(lambda *a: jnp.sum(inkernel(*a) ** 2), argnums=(0, 1, 2))(
        qkv, rhf, rwf
    )
    for a, b_ in zip(ge, gi):
        assert np.isfinite(np.asarray(b_)).all()
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=1e-3, atol=1e-4
        )
