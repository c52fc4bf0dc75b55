"""SAM registry + torch-checkpoint surgery (reference
``src/models/segment_anything/build_sam.py:24-342``).

``sam_model_registry[name](image_size, num_classes, ...) -> (model,
embed_size)`` mirrors the reference call shape; checkpoints load via
``load_torch_sam_checkpoint`` which performs the reference's ``load_from``
surgery (pos-embed bilinear resize, global-layer rel-pos resize, dropping
mask-token/hypernetwork/iou heads) while converting to flax layout.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

import jax.numpy as jnp

from .sam import Sam, SamDualmask

_VIT_SPECS = {
    "vit_h": dict(embed_dim=1280, depth=32, num_heads=16, global_idx=(7, 15, 23, 31)),
    "vit_l": dict(embed_dim=1024, depth=24, num_heads=16, global_idx=(5, 11, 17, 23)),
    "vit_b": dict(embed_dim=768, depth=12, num_heads=12, global_idx=(2, 5, 8, 11)),
}


def _build_plain(spec_name: str):
    spec = _VIT_SPECS[spec_name]

    def build(image_size, num_classes, checkpoint=None, lora_rank=0,
              compute_dtype=jnp.float32, **kwargs):
        model = Sam(
            img_size=image_size,
            num_classes=num_classes,
            encoder_embed_dim=spec["embed_dim"],
            encoder_depth=spec["depth"],
            encoder_num_heads=spec["num_heads"],
            encoder_global_attn_indexes=spec["global_idx"],
            lora_rank=lora_rank,
            dtype=compute_dtype,
        )
        return model, image_size // 16

    return build


def build_sam_vit_b_dualmask(
    image_size,
    num_classes,
    checkpoint=None,
    dropout_rate=0.0,
    num_points_prompt=(1, 2),
    bbox_change_rate=(0.1, 0.2),
    lora_rank=0,
    compute_dtype=jnp.float32,
    **kwargs,
):
    spec = _VIT_SPECS["vit_b"]
    model = SamDualmask(
        img_size=image_size,
        num_classes=num_classes,
        encoder_embed_dim=spec["embed_dim"],
        encoder_depth=spec["depth"],
        encoder_num_heads=spec["num_heads"],
        encoder_global_attn_indexes=spec["global_idx"],
        dropout_rate=dropout_rate,
        num_points_prompt=tuple(num_points_prompt),
        bbox_change_rate=tuple(bbox_change_rate),
        lora_rank=lora_rank,
        dtype=compute_dtype,
    )
    return model, image_size // 16


sam_model_registry = {
    "default": _build_plain("vit_h"),
    "vit_h": _build_plain("vit_h"),
    "vit_l": _build_plain("vit_l"),
    "vit_b": _build_plain("vit_b"),
    "vit_b_dualmask_same_prompt_class_random_large": build_sam_vit_b_dualmask,
}


# ---------------------------------------------------------------------------
# torch SAM checkpoint → flax encoder params (with load_from surgery)
# ---------------------------------------------------------------------------


def _np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _interp_linear(x: np.ndarray, new_len: int) -> np.ndarray:
    """torch F.interpolate(mode=linear/bilinear, align_corners=False) on
    axis 0."""
    n = x.shape[0]
    if n == new_len:
        return x
    pos = (np.arange(new_len) + 0.5) * n / new_len - 0.5
    lo = np.clip(np.floor(pos).astype(int), 0, n - 1)
    hi = np.clip(lo + 1, 0, n - 1)
    frac = np.clip(pos - lo, 0.0, 1.0).reshape((new_len,) + (1,) * (x.ndim - 1))
    return x[lo] * (1 - frac) + x[hi] * frac


def import_torch_sam_encoder(
    state_dict: Mapping[str, Any],
    depth: int,
    image_size: int,
    patch_size: int = 16,
    global_attn_indexes=(2, 5, 8, 11),
    prefix: str = "image_encoder.",
) -> dict:
    """Torch SAM ``image_encoder.*`` weights → flax ImageEncoderViT params,
    applying the reference's resize surgery (``build_sam.py:296-342``)."""
    sd = {k[len(prefix):]: _np(v) for k, v in state_dict.items() if k.startswith(prefix)}
    token_size = image_size // patch_size

    params: dict[str, Any] = {}
    params["patch_embed"] = {
        "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
        "bias": sd["patch_embed.proj.bias"],
    }
    pos = sd["pos_embed"]  # (1, S, S, C)
    if pos.shape[1] != token_size:
        # bilinear resize over the two spatial axes (align_corners=False)
        pos = _interp_linear(pos[0], token_size)
        pos = _interp_linear(pos.transpose(1, 0, 2), token_size).transpose(1, 0, 2)
        pos = pos[None]
    params["pos_embed"] = pos

    for i in range(depth):
        b = f"blocks.{i}."
        blk: dict[str, Any] = {
            "norm1": {"scale": sd[b + "norm1.weight"], "bias": sd[b + "norm1.bias"]},
            "norm2": {"scale": sd[b + "norm2.weight"], "bias": sd[b + "norm2.bias"]},
            "attn": {
                "qkv": {
                    "kernel": sd[b + "attn.qkv.weight"].T,
                    "bias": sd[b + "attn.qkv.bias"],
                },
                "proj": {
                    "kernel": sd[b + "attn.proj.weight"].T,
                    "bias": sd[b + "attn.proj.bias"],
                },
            },
            "mlp": {
                "lin1": {"kernel": sd[b + "mlp.lin1.weight"].T, "bias": sd[b + "mlp.lin1.bias"]},
                "lin2": {"kernel": sd[b + "mlp.lin2.weight"].T, "bias": sd[b + "mlp.lin2.bias"]},
            },
        }
        rel_h = sd[b + "attn.rel_pos_h"]
        rel_w = sd[b + "attn.rel_pos_w"]
        if i in global_attn_indexes:
            target = 2 * token_size - 1
        else:
            target = rel_h.shape[0]  # window layers keep 2*14-1
        blk["attn"]["rel_pos_h"] = _interp_linear(rel_h, target)
        blk["attn"]["rel_pos_w"] = _interp_linear(rel_w, target)
        params[f"block{i}"] = blk

    params["neck_conv1"] = {"kernel": sd["neck.0.weight"].transpose(2, 3, 1, 0)}
    params["neck_norm1"] = {"weight": sd["neck.1.weight"], "bias": sd["neck.1.bias"]}
    params["neck_conv2"] = {"kernel": sd["neck.2.weight"].transpose(2, 3, 1, 0)}
    params["neck_norm2"] = {"weight": sd["neck.3.weight"], "bias": sd["neck.3.bias"]}
    return params
