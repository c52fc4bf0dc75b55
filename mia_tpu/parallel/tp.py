"""Tensor-parallel SAM ViT image encoder (Megatron-style) over a
``("data", "model")`` mesh via ``shard_map``.

The reference trains strictly single-GPU (``src/training/cpcsam_trainer.py``
has no ``torch.distributed``); this module is the TPU-native scale-out path
for the CPC-SAM FLOPs hot spot. Per transformer block:

- the qkv projection is COLUMN-parallel over attention heads (each model
  shard computes its head group's q/k/v — the LoRA ``B`` matrices shard the
  same way, ``A`` stays replicated since its rank axis is tiny),
- attention itself is embarrassingly parallel over heads (decomposed
  rel-pos terms are per-head; each shard runs the standard fused kernel on
  its local heads),
- the output projection is ROW-parallel: each shard contracts its heads'
  context with its (H_loc·D, C) kernel slice and ONE ``psum`` over the
  ``model`` axis completes the sum-over-heads, bias added once after,
- the MLP is the classic column(lin1)/row(lin2) pair with the second
  ``psum`` of the block.

Everything outside the blocks (patch embed, pos embed, LayerNorms, neck)
is replicated compute on batch-sharded activations. Two psums per block
ride the ICI; under ``jax.grad`` their transposes give the correct sharded
parameter cotangents, so the optimizer state shards with the params
(ZeRO-style memory scaling for free).

Params arrive in the STANDARD ``ImageEncoderViT`` pytree (so torch-surgery
checkpoints import unchanged); ``prepare_tp_params`` reshapes the fused
qkv/proj axes into head-explicit forms that ``shard_map`` in_specs can
split, and ``unprepare_tp_params`` inverts it exactly.
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # moved between jax versions (and dropped check_rep for check_vma)
    from jax import shard_map as _shard_map  # type: ignore

    def shard_map(f, *, mesh, in_specs, out_specs):
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, *, mesh, in_specs, out_specs):
        return _shard_map_old(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )


# ---------------------------------------------------------------------------
# param layout: standard pytree <-> head-explicit TP layout
# ---------------------------------------------------------------------------


def _is_block(name: str) -> bool:
    return name.startswith("block") and name[5:].isdigit()


def prepare_tp_params(params: dict, num_heads: int) -> dict:
    """Reshape each block's fused projection params so the head axis is
    explicit (splittable by a contiguous PartitionSpec):

    - ``attn/qkv/kernel``  (C, 3C)  -> (C, 3, H, D)
    - ``attn/qkv/bias``    (3C,)    -> (3, H, D)
    - ``attn/proj/kernel`` (C, C)   -> (H, D, C)
    - ``attn/lora_b_{q,v}/kernel`` (r, C) -> (r, H, D)

    Everything else passes through unchanged.
    """
    out = {}
    for name, sub in params.items():
        if not _is_block(name):
            out[name] = sub
            continue
        blk = dict(sub)
        attn = dict(blk["attn"])
        c = attn["qkv"]["kernel"].shape[0]
        d = c // num_heads
        qkv = dict(attn["qkv"])
        qkv["kernel"] = qkv["kernel"].reshape(c, 3, num_heads, d)
        if "bias" in qkv:
            qkv["bias"] = qkv["bias"].reshape(3, num_heads, d)
        attn["qkv"] = qkv
        proj = dict(attn["proj"])
        proj["kernel"] = proj["kernel"].reshape(num_heads, d, c)
        attn["proj"] = proj
        for lname in ("lora_b_q", "lora_b_v"):
            if lname in attn:
                lk = dict(attn[lname])
                r = lk["kernel"].shape[0]
                lk["kernel"] = lk["kernel"].reshape(r, num_heads, d)
                attn[lname] = lk
        blk["attn"] = attn
        out[name] = blk
    return out


def unprepare_tp_params(params: dict, num_heads: int) -> dict:
    """Exact inverse of :func:`prepare_tp_params`."""
    out = {}
    for name, sub in params.items():
        if not _is_block(name):
            out[name] = sub
            continue
        blk = dict(sub)
        attn = dict(blk["attn"])
        c = attn["qkv"]["kernel"].shape[0]
        qkv = dict(attn["qkv"])
        qkv["kernel"] = qkv["kernel"].reshape(c, 3 * c)
        if "bias" in qkv:
            qkv["bias"] = qkv["bias"].reshape(3 * c)
        attn["qkv"] = qkv
        proj = dict(attn["proj"])
        proj["kernel"] = proj["kernel"].reshape(c, c)
        attn["proj"] = proj
        for lname in ("lora_b_q", "lora_b_v"):
            if lname in attn:
                lk = dict(attn[lname])
                lk["kernel"] = lk["kernel"].reshape(lk["kernel"].shape[0], c)
                attn[lname] = lk
        blk["attn"] = attn
        out[name] = blk
    return out


def tp_param_specs(prepared: dict, model_axis: str = "model"):
    """PartitionSpec tree for a :func:`prepare_tp_params` pytree."""

    def spec_for(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        if len(names) >= 2 and _is_block(str(names[0])) and names[1] == "attn":
            tail = names[2:]
            if tail[:1] == ["qkv"] and tail[-1] == "kernel":
                return P(None, None, model_axis, None)
            if tail[:1] == ["qkv"] and tail[-1] == "bias":
                return P(None, model_axis, None)
            if tail[:1] == ["proj"] and tail[-1] == "kernel":
                return P(model_axis, None, None)
            if tail[0] in ("lora_b_q", "lora_b_v") and tail[-1] == "kernel":
                return P(None, model_axis, None)
        if len(names) >= 2 and _is_block(str(names[0])) and names[1] == "mlp":
            tail = names[2:]
            if tail[:1] == ["lin1"] and tail[-1] == "kernel":
                return P(None, model_axis)
            if tail[:1] == ["lin1"] and tail[-1] == "bias":
                return P(model_axis)
            if tail[:1] == ["lin2"] and tail[-1] == "kernel":
                return P(model_axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, prepared)


# ---------------------------------------------------------------------------
# local (per-shard) forward
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) / jnp.sqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _layer_norm_2d(x, p, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) / jnp.sqrt(var + eps)
    return (y * p["weight"] + p["bias"]).astype(x.dtype)


def _attention_local(q, k, v, rel_pos_h, rel_pos_w, scale, hw, use_rel_pos,
                     dtype):
    """Per-shard attention over LOCAL heads. q/k/v: (B', N, H_loc, D),
    token-major (the qkv einsum output layout). Returns (B', N, H_loc, D).

    On TPU this runs the same fused Pallas kernel the single-device encoder
    uses (a model shard's problem IS a standard head-major problem);
    elsewhere the einsum path (exact module parity)."""
    from ..models.sam.image_encoder import (
        add_decomposed_rel_pos,
        decomposed_rel_terms,
    )

    b, n, hl, d = q.shape
    h, w = hw
    q_hm = q.transpose(0, 2, 1, 3)  # (B', H_loc, N, D)
    k_hm = k.transpose(0, 2, 1, 3)
    v_hm = v.transpose(0, 2, 1, 3)

    if jax.default_backend() == "tpu":
        from ..ops.attention import attention_rel_with_padding

        if use_rel_pos:
            rel_h, rel_w = decomposed_rel_terms(
                q_hm, rel_pos_h, rel_pos_w, hw, hw
            )
        else:
            rel_h = jnp.zeros((b, hl, n, h), q.dtype)
            rel_w = jnp.zeros((b, hl, n, w), q.dtype)
        bh = b * hl
        out = attention_rel_with_padding(
            q_hm.reshape(bh, n, d),
            k_hm.reshape(bh, n, d),
            v_hm.reshape(bh, n, d),
            rel_h.reshape(bh, n, h),
            rel_w.reshape(bh, n, w),
            scale,
            hw,
        ).reshape(b, hl, n, d)
    else:
        attn = jnp.einsum(
            "bnqc,bnkc->bnqk", q_hm * scale, k_hm,
            preferred_element_type=jnp.float32,
        )
        if use_rel_pos:
            attn = add_decomposed_rel_pos(
                attn, q_hm, rel_pos_h, rel_pos_w, hw, hw
            )
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            v_hm.dtype
        )
        out = jnp.einsum(
            "bnqk,bnkc->bnqc", attn, v_hm, preferred_element_type=jnp.float32
        )
    return out.astype(dtype).transpose(0, 2, 1, 3)


def _block_local(x, p, *, window_size, use_rel_pos, lora_rank, model_axis,
                 dtype):
    """One transformer block on a model shard (x replicated across the
    model axis, batch-local; params head/hidden-local)."""
    from ..models.sam.image_encoder import window_partition, window_unpartition

    full_h, full_w = x.shape[1], x.shape[2]
    shortcut = x
    y = _layer_norm(x, p["norm1"])

    ws = window_size
    if ws > 0:
        # reference ordering: pad+partition the post-LN grid, qkv on windows
        # (pad tokens pick up the qkv bias — real queries attend to them,
        # image_encoder.py:246-267 semantics)
        y, pad_hw = window_partition(y, ws)
        h = w = ws
    else:
        h, w = full_h, full_w
    b2 = y.shape[0]
    n = h * w
    c = y.shape[-1]
    yf = y.reshape(b2, n, c)

    qkv_k = p["attn"]["qkv"]["kernel"].astype(dtype)  # (C, 3, H_loc, D)
    hl, d = qkv_k.shape[2], qkv_k.shape[3]
    qkv = jnp.einsum("bnc,cthd->bnthd", yf.astype(dtype), qkv_k)
    if "bias" in p["attn"]["qkv"]:
        qkv = qkv + p["attn"]["qkv"]["bias"].astype(dtype)
    if lora_rank > 0:
        for slot, nm in ((0, "q"), (2, "v")):
            a = jnp.einsum(
                "bnc,cr->bnr", yf.astype(dtype),
                p["attn"][f"lora_a_{nm}"]["kernel"].astype(dtype),
            )
            delta = jnp.einsum(
                "bnr,rhd->bnhd", a,
                p["attn"][f"lora_b_{nm}"]["kernel"].astype(dtype),
            )
            qkv = qkv.at[:, :, slot].add(delta)

    out = _attention_local(
        qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
        p["attn"].get("rel_pos_h"), p["attn"].get("rel_pos_w"),
        d ** -0.5, (h, w), use_rel_pos, dtype,
    )  # (B', N, H_loc, D)

    # row-parallel output projection: partial sum over local heads, ONE
    # psum completes the head sum, bias added once
    ctx = jnp.einsum(
        "bnhd,hdc->bnc", out, p["attn"]["proj"]["kernel"].astype(dtype)
    )
    ctx = jax.lax.psum(ctx, model_axis) + p["attn"]["proj"]["bias"].astype(dtype)
    ctx = ctx.reshape(b2, h, w, c)
    if ws > 0:
        ctx = window_unpartition(ctx, ws, pad_hw, (full_h, full_w))
    x = shortcut + ctx

    y2 = _layer_norm(x, p["norm2"])
    h1 = jnp.einsum(
        "bhwc,cf->bhwf", y2.astype(dtype), p["mlp"]["lin1"]["kernel"].astype(dtype)
    ) + p["mlp"]["lin1"]["bias"].astype(dtype)
    h1 = jax.nn.gelu(h1, approximate=False)
    h2 = jnp.einsum(
        "bhwf,fc->bhwc", h1, p["mlp"]["lin2"]["kernel"].astype(dtype)
    )
    h2 = jax.lax.psum(h2, model_axis) + p["mlp"]["lin2"]["bias"].astype(dtype)
    return x + h2


def encoder_tp_apply(
    params: dict,
    x: jnp.ndarray,
    *,
    depth: int,
    patch_size: int = 16,
    window_size: int = 0,
    global_attn_indexes: tuple[int, ...] = (),
    use_abs_pos: bool = True,
    use_rel_pos: bool = False,
    lora_rank: int = 0,
    dtype=jnp.float32,
    model_axis: str = "model",
):
    """The per-shard encoder forward (call INSIDE ``shard_map``): ``params``
    is a :func:`prepare_tp_params` pytree SHARD, ``x`` a (B_loc, H, W, 3)
    batch shard. Matches ``ImageEncoderViT.__call__`` exactly for real
    tokens (see tests/test_tp.py for the fp-exactness bounds)."""
    x = x.astype(dtype)
    pk = params["patch_embed"]["kernel"].astype(dtype)
    x = jax.lax.conv_general_dilated(
        x, pk, (patch_size, patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed"]["bias"].astype(dtype)
    if use_abs_pos:
        x = x + params["pos_embed"].astype(dtype)

    for i in range(depth):
        x = _block_local(
            x,
            params[f"block{i}"],
            window_size=0 if i in global_attn_indexes else window_size,
            use_rel_pos=use_rel_pos,
            lora_rank=lora_rank,
            model_axis=model_axis,
            dtype=dtype,
        )

    x = jnp.einsum(
        "bhwc,co->bhwo", x, params["neck_conv1"]["kernel"][0, 0].astype(dtype)
    )
    x = _layer_norm_2d(x, params["neck_norm1"])
    x = jax.lax.conv_general_dilated(
        x, params["neck_conv2"]["kernel"].astype(dtype), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return _layer_norm_2d(x, params["neck_norm2"])


# ---------------------------------------------------------------------------
# public: sharded forward builder
# ---------------------------------------------------------------------------


def make_tp_encoder_forward(
    encoder,
    mesh: Mesh,
    *,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Build ``forward(prepared_params, images) -> embeddings`` shard_mapped
    over ``mesh``: batch over ``data_axis``, heads/hidden over
    ``model_axis``. ``encoder`` is the ``ImageEncoderViT`` module whose
    param pytree (after :func:`prepare_tp_params`) is being sharded.

    Requirements: ``num_heads`` and ``mlp_dim = embed_dim * mlp_ratio``
    divisible by the model-axis size; batch divisible by the data-axis
    size. The returned fn is differentiable — param cotangents come back
    with the same shardings (sharded optimizer states for free).
    """
    m = mesh.shape[model_axis]
    if encoder.num_heads % m:
        raise ValueError(f"num_heads {encoder.num_heads} % model axis {m}")
    if int(encoder.embed_dim * encoder.mlp_ratio) % m:
        raise ValueError("mlp hidden dim not divisible by model axis")

    apply_local = functools.partial(
        encoder_tp_apply,
        depth=encoder.depth,
        patch_size=encoder.patch_size,
        window_size=encoder.window_size,
        global_attn_indexes=tuple(encoder.global_attn_indexes),
        use_abs_pos=encoder.use_abs_pos,
        use_rel_pos=encoder.use_rel_pos,
        lora_rank=encoder.lora_rank,
        dtype=encoder.dtype,
        model_axis=model_axis,
    )

    def forward(prepared_params, images):
        specs = tp_param_specs(prepared_params, model_axis)
        fn = shard_map(
            apply_local,
            mesh=mesh,
            in_specs=(specs, P(data_axis)),
            out_specs=P(data_axis),
        )
        return fn(prepared_params, images)

    return forward


def tp_shardings(prepared: dict, mesh: Mesh, model_axis: str = "model"):
    """NamedShardings matching :func:`tp_param_specs` (for device_put)."""
    from jax.sharding import NamedSharding

    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        tp_param_specs(prepared, model_axis),
        is_leaf=lambda s: isinstance(s, P),
    )
