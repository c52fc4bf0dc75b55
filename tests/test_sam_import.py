"""SAM torch-checkpoint surgery: key conversion + pos-embed / rel-pos
resize (reference ``build_sam.py:296-342``)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from mia_tpu.models.sam import ImageEncoderViT, import_torch_sam_encoder


def _mint_torch_sam_encoder_sd(embed_dim=32, depth=2, heads=2, src_tokens=8,
                               window=14, global_idx=(1,)):
    """A torch state_dict in the upstream SAM image_encoder key layout,
    pretending the checkpoint was trained at ``src_tokens``² tokens."""
    g = torch.Generator().manual_seed(0)
    head_dim = embed_dim // heads
    sd = {}
    sd["image_encoder.patch_embed.proj.weight"] = torch.randn(embed_dim, 3, 16, 16, generator=g)
    sd["image_encoder.patch_embed.proj.bias"] = torch.randn(embed_dim, generator=g)
    sd["image_encoder.pos_embed"] = torch.randn(1, src_tokens, src_tokens, embed_dim, generator=g)
    for i in range(depth):
        b = f"image_encoder.blocks.{i}."
        sd[b + "norm1.weight"] = torch.randn(embed_dim, generator=g)
        sd[b + "norm1.bias"] = torch.randn(embed_dim, generator=g)
        sd[b + "norm2.weight"] = torch.randn(embed_dim, generator=g)
        sd[b + "norm2.bias"] = torch.randn(embed_dim, generator=g)
        sd[b + "attn.qkv.weight"] = torch.randn(embed_dim * 3, embed_dim, generator=g)
        sd[b + "attn.qkv.bias"] = torch.randn(embed_dim * 3, generator=g)
        sd[b + "attn.proj.weight"] = torch.randn(embed_dim, embed_dim, generator=g)
        sd[b + "attn.proj.bias"] = torch.randn(embed_dim, generator=g)
        rel_len = 2 * (src_tokens if i in global_idx else window) - 1
        sd[b + "attn.rel_pos_h"] = torch.randn(rel_len, head_dim, generator=g)
        sd[b + "attn.rel_pos_w"] = torch.randn(rel_len, head_dim, generator=g)
        sd[b + "mlp.lin1.weight"] = torch.randn(embed_dim * 4, embed_dim, generator=g)
        sd[b + "mlp.lin1.bias"] = torch.randn(embed_dim * 4, generator=g)
        sd[b + "mlp.lin2.weight"] = torch.randn(embed_dim, embed_dim * 4, generator=g)
        sd[b + "mlp.lin2.bias"] = torch.randn(embed_dim, generator=g)
    sd["image_encoder.neck.0.weight"] = torch.randn(16, embed_dim, 1, 1, generator=g)
    sd["image_encoder.neck.1.weight"] = torch.randn(16, generator=g)
    sd["image_encoder.neck.1.bias"] = torch.randn(16, generator=g)
    sd["image_encoder.neck.2.weight"] = torch.randn(16, 16, 3, 3, generator=g)
    sd["image_encoder.neck.3.weight"] = torch.randn(16, generator=g)
    sd["image_encoder.neck.3.bias"] = torch.randn(16, generator=g)
    return sd


def test_import_torch_sam_encoder_resizes_and_runs(rng):
    # checkpoint at 8x8 tokens (img 128), target 4x4 tokens (img 64)
    sd = _mint_torch_sam_encoder_sd(src_tokens=8)
    params = import_torch_sam_encoder(
        sd, depth=2, image_size=64, global_attn_indexes=(1,)
    )
    # pos embed resized 8 -> 4
    assert params["pos_embed"].shape == (1, 4, 4, 32)
    # global layer rel-pos resized to 2*4-1, window layer keeps 2*14-1
    assert params["block1"]["attn"]["rel_pos_h"].shape == (7, 16)
    assert params["block0"]["attn"]["rel_pos_h"].shape == (27, 16)

    # the converted params load into the flax encoder and run
    enc = ImageEncoderViT(
        img_size=64, embed_dim=32, depth=2, num_heads=2, out_chans=16,
        use_rel_pos=True, window_size=14, global_attn_indexes=(1,),
    )
    x = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    init = enc.init(jax.random.PRNGKey(0), x)
    # structures must match exactly (all keys converted)
    ref_flat = jax.tree_util.tree_structure(init["params"])
    got_flat = jax.tree_util.tree_structure(params)
    assert ref_flat == got_flat
    out = enc.apply({"params": params}, x)
    assert out.shape == (1, 4, 4, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_import_without_resize_is_exact():
    sd = _mint_torch_sam_encoder_sd(src_tokens=4)
    params = import_torch_sam_encoder(
        sd, depth=2, image_size=64, global_attn_indexes=(1,)
    )
    np.testing.assert_allclose(
        params["pos_embed"], sd["image_encoder.pos_embed"].numpy(), atol=0
    )
    np.testing.assert_allclose(
        params["block0"]["attn"]["qkv"]["kernel"],
        sd["image_encoder.blocks.0.attn.qkv.weight"].numpy().T,
        atol=0,
    )
