"""Tiny PyTorch mirror of the CPC-SAM dual-mask stack for cross-framework
numeric parity tests (reference torch semantics:
``src/models/segment_anything/modeling/sam_dualmask_same_prompt_class_random_large.py``,
``prompt_encoder_prompt_class.py``, ``mask_decoder_prompt_large.py``,
``transformer.py``, ``image_encoder.py``).

The mirror consumes the FLAX param tree verbatim: every leaf becomes a
``torch.nn.Parameter`` in the flax layout and the forward code performs any
permutes (Dense as ``x @ kernel``, convs permuted to NCHW-weight form at
call time). torch's own conv / matmul / softmax / interpolate kernels do
the compute, so loss parity here is a genuine cross-framework check of the
whole dual-mask forward + loss composition.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


class JaxParams(nn.Module):
    """The flax param tree as a flat ParameterDict ('/'-joined keys)."""

    def __init__(self, params):
        super().__init__()
        self.p = nn.ParameterDict(
            {
                "/".join(path): nn.Parameter(
                    torch.tensor(np.array(leaf, np.float32))
                )
                for path, leaf in _flatten(params).items()
            }
        )

    def __getitem__(self, key):
        return self.p[key]

    def has(self, key):
        return key in self.p


def dense(p, prefix, x):
    w = p[f"{prefix}/kernel"]  # (in, out) flax layout
    y = x @ w
    if p.has(f"{prefix}/bias"):
        y = y + p[f"{prefix}/bias"]
    return y


def conv2d(p, prefix, x_nchw, stride=1, padding=0):
    w = p[f"{prefix}/kernel"].permute(3, 2, 0, 1)  # (kh,kw,ci,co)->(co,ci,kh,kw)
    b = p[f"{prefix}/bias"] if p.has(f"{prefix}/bias") else None
    return F.conv2d(x_nchw, w, b, stride=stride, padding=padding)


def conv_transpose2d(p, prefix, x_nchw, stride=2):
    # flax ConvTranspose correlates; torch's transposed conv convolves ->
    # spatial flip (mirror of mia_tpu.models.torch_port._conv_transpose)
    w = p[f"{prefix}/kernel"].flip(0, 1).permute(2, 3, 0, 1)  # (ci,co,kh,kw)
    b = p[f"{prefix}/bias"] if p.has(f"{prefix}/bias") else None
    return F.conv_transpose2d(x_nchw, w, b, stride=stride)


def layer_norm(p, prefix, x, eps):
    return F.layer_norm(
        x, (x.shape[-1],), p[f"{prefix}/scale"], p[f"{prefix}/bias"], eps=eps
    )


def layer_norm_2d(p, prefix, x_nchw, eps=1e-6):
    # torch LayerNorm2d: stats over the channel dim of NCHW
    mu = x_nchw.mean(1, keepdim=True)
    var = ((x_nchw - mu) ** 2).mean(1, keepdim=True)
    y = (x_nchw - mu) / torch.sqrt(var + eps)
    return y * p[f"{prefix}/weight"][None, :, None, None] + p[f"{prefix}/bias"][
        None, :, None, None
    ]


# ---------------------------------------------------------------------------
# image encoder
# ---------------------------------------------------------------------------


def window_partition_t(x, ws):
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    if ph or pw:
        x = F.pad(x, (0, 0, 0, pw, 0, ph))
    hp, wp = h + ph, w + pw
    x = x.view(b, hp // ws, ws, wp // ws, ws, c)
    wins = x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return wins, (hp, wp)


def window_unpartition_t(wins, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = wins.shape[0] // (hp * wp // ws // ws)
    x = wins.view(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _rel_pos_table(rel_pos, q_size, k_size):
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = (
            F.interpolate(
                rel_pos.t()[None], size=max_rel_dist, mode="linear",
                align_corners=False,
            )[0].t()
        )
    q_coords = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.long()]


def vit_attention(p, prefix, x, num_heads, use_rel_pos, lora_rank):
    """x (B', H, W, C) windowed or global."""
    b, h, w, c = x.shape
    n = h * w
    head_dim = c // num_heads
    scale = head_dim**-0.5
    qkv = dense(p, f"{prefix}/qkv", x.reshape(b, n, c)).reshape(
        b, n, 3, num_heads, head_dim
    )
    if lora_rank > 0:
        for j, name in ((0, "q"), (2, "v")):
            a = dense(p, f"{prefix}/lora_a_{name}", x.reshape(b, n, c))
            d = dense(p, f"{prefix}/lora_b_{name}", a)
            qkv = qkv.clone()
            qkv[:, :, j] = qkv[:, :, j] + d.reshape(b, n, num_heads, head_dim)
    q, k, v = (qkv[:, :, i].permute(0, 2, 1, 3) for i in range(3))  # (B,hd,N,D)
    attn = (q * scale) @ k.transpose(-2, -1)
    if use_rel_pos:
        rh = _rel_pos_table(p[f"{prefix}/rel_pos_h"], h, h)
        rw = _rel_pos_table(p[f"{prefix}/rel_pos_w"], w, w)
        rq = q.reshape(b, num_heads, h, w, head_dim)
        rel_h = torch.einsum("bnhwc,hkc->bnhwk", rq, rh)
        rel_w = torch.einsum("bnhwc,wkc->bnhwk", rq, rw)
        attn = attn.view(b, num_heads, h, w, h, w)
        attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
        attn = attn.view(b, num_heads, n, n)
    attn = attn.softmax(-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(b, h, w, c)
    return dense(p, f"{prefix}/proj", out)


def vit_block(p, prefix, x, num_heads, window_size, lora_rank):
    shortcut = x
    y = layer_norm(p, f"{prefix}/norm1", x, 1e-6)
    if window_size > 0:
        y, pad_hw = window_partition_t(y, window_size)
    y = vit_attention(
        p, f"{prefix}/attn", y, num_heads, use_rel_pos=True, lora_rank=lora_rank
    )
    if window_size > 0:
        y = window_unpartition_t(y, window_size, pad_hw, (x.shape[1], x.shape[2]))
    x = shortcut + y
    z = layer_norm(p, f"{prefix}/norm2", x, 1e-6)
    z = dense(p, f"{prefix}/mlp/lin1", z)
    z = F.gelu(z)
    z = dense(p, f"{prefix}/mlp/lin2", z)
    return x + z


def image_encoder(p, x_bhwc, *, depth, num_heads, window_size,
                  global_attn_indexes, lora_rank=0):
    pe = conv2d(p, "image_encoder/patch_embed", x_bhwc.permute(0, 3, 1, 2),
                stride=p["image_encoder/patch_embed/kernel"].shape[0])
    x = pe.permute(0, 2, 3, 1)  # (B, s, s, C)
    x = x + p["image_encoder/pos_embed"]
    for i in range(depth):
        ws = 0 if i in global_attn_indexes else window_size
        x = vit_block(p, f"image_encoder/block{i}", x, num_heads, ws, lora_rank)
    y = x.permute(0, 3, 1, 2)
    y = conv2d(p, "image_encoder/neck_conv1", y)
    y = layer_norm_2d(p, "image_encoder/neck_norm1", y)
    y = conv2d(p, "image_encoder/neck_conv2", y, padding=1)
    y = layer_norm_2d(p, "image_encoder/neck_norm2", y)
    return y.permute(0, 2, 3, 1)  # channel-last like the flax model


# ---------------------------------------------------------------------------
# prompt encoder (class-indexed)
# ---------------------------------------------------------------------------


def _pe_encoding(p, coords):
    g = p["prompt_encoder/pe_layer/positional_encoding_gaussian_matrix"]
    coords = 2 * coords - 1
    coords = coords @ g.detach()
    coords = 2 * math.pi * coords
    return torch.cat([coords.sin(), coords.cos()], -1)


def dense_pe(p, size):
    h, w = size
    y = (torch.arange(h, dtype=torch.float32) + 0.5) / h
    x = (torch.arange(w, dtype=torch.float32) + 0.5) / w
    grid = torch.stack([x[None, :].expand(h, w), y[:, None].expand(h, w)], -1)
    return _pe_encoding(p, grid)[None]  # (1, H, W, C)


def _embed_points(p, points, labels, pad, input_size, num_classes):
    points = points + 0.5
    if pad:
        points = torch.cat([points, torch.zeros(points.shape[0], 1, 2)], 1)
        labels = torch.cat(
            [labels, -torch.ones(labels.shape[0], 1, dtype=labels.dtype)], 1
        )
    coords = points.clone()
    coords[..., 0] = coords[..., 0] / input_size[1]
    coords[..., 1] = coords[..., 1] / input_size[0]
    pe = _pe_encoding(p, coords)
    invalid = (labels == -1)[..., None]
    pe = torch.where(invalid, p["prompt_encoder/not_a_point_embed"][0], pe)
    onehot = F.one_hot(
        labels.clamp(0, num_classes - 1).long(), num_classes
    ).float()
    class_add = onehot @ p["prompt_encoder/point_embeddings"]
    return pe + torch.where(invalid, torch.zeros(()), class_add)


def _embed_boxes(p, boxes, labels, input_size, num_classes):
    boxes = boxes + 0.5
    b, n = boxes.shape[0], boxes.shape[1]
    coords = boxes.reshape(b, n * 2, 2).clone()
    coords[..., 0] = coords[..., 0] / input_size[1]
    coords[..., 1] = coords[..., 1] / input_size[0]
    pe = _pe_encoding(p, coords).reshape(b, n, 2, -1)
    onehot = F.one_hot(labels.long(), num_classes).float()
    emb = p["prompt_encoder/box_corner_embeddings"]
    pe = pe.clone()
    pe[:, :, 0] = pe[:, :, 0] + onehot @ emb[:num_classes]
    pe[:, :, 1] = pe[:, :, 1] + onehot @ emb[num_classes:]
    return pe.reshape(b, n * 2, -1)


def prompt_encoder(p, *, points=None, boxes=None, masks=None,
                   embed_dim, image_embedding_size, input_image_size,
                   num_classes=4):
    if points is not None:
        bs = points[0].shape[0]
    elif boxes is not None:
        bs = boxes[0].shape[0]
    elif masks is not None:
        bs = masks.shape[0]
    else:
        bs = 1
    sparse = torch.zeros(bs, 0, embed_dim)
    if points is not None:
        coords, labels = points
        sparse = torch.cat(
            [sparse, _embed_points(p, coords, labels, boxes is None,
                                   input_image_size, num_classes)], 1)
    if boxes is not None:
        coords, labels = boxes
        sparse = torch.cat(
            [sparse, _embed_boxes(p, coords, labels, input_image_size,
                                  num_classes)], 1)
    if masks is not None:
        y = masks.permute(0, 3, 1, 2)
        y = conv2d(p, "prompt_encoder/mask_downscaling/conv1", y, stride=2)
        y = layer_norm_2d(p, "prompt_encoder/mask_downscaling/norm1", y)
        y = F.gelu(y)
        y = conv2d(p, "prompt_encoder/mask_downscaling/conv2", y, stride=2)
        y = layer_norm_2d(p, "prompt_encoder/mask_downscaling/norm2", y)
        y = F.gelu(y)
        y = conv2d(p, "prompt_encoder/mask_downscaling/conv3", y)
        dense_emb = y.permute(0, 2, 3, 1)
    else:
        h, w = image_embedding_size
        dense_emb = (
            p["prompt_encoder/no_mask_embed"].reshape(1, 1, 1, -1)
            .expand(bs, h, w, embed_dim)
        )
    return sparse, dense_emb


# ---------------------------------------------------------------------------
# two-way transformer + decoder
# ---------------------------------------------------------------------------


def tw_attention(p, prefix, q, k, v, num_heads):
    q = dense(p, f"{prefix}/q_proj", q)
    k = dense(p, f"{prefix}/k_proj", k)
    v = dense(p, f"{prefix}/v_proj", v)

    def heads(x):
        b, n, c = x.shape
        return x.view(b, n, num_heads, c // num_heads).permute(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    attn = q @ k.transpose(-2, -1) / math.sqrt(q.shape[-1])
    attn = attn.softmax(-1)
    out = attn @ v
    b, nh, n, c = out.shape
    out = out.permute(0, 2, 1, 3).reshape(b, n, nh * c)
    return dense(p, f"{prefix}/out_proj", out)


def twoway_transformer(p, prefix, image_embedding, image_pe, point_embedding,
                       *, depth=2, num_heads=8):
    b, h, w, c = image_embedding.shape
    keys = image_embedding.reshape(b, h * w, c)
    key_pe = image_pe.reshape(image_pe.shape[0], h * w, c)
    queries = point_embedding
    for i in range(depth):
        lp = f"{prefix}/layer{i}"
        if i == 0:
            queries = tw_attention(p, f"{lp}/self_attn", queries, queries,
                                   queries, num_heads)
        else:
            q = queries + point_embedding
            queries = queries + tw_attention(p, f"{lp}/self_attn", q, q,
                                             queries, num_heads)
        queries = layer_norm(p, f"{lp}/norm1", queries, 1e-5)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + tw_attention(
            p, f"{lp}/cross_attn_token_to_image", q, k, keys, num_heads)
        queries = layer_norm(p, f"{lp}/norm2", queries, 1e-5)
        z = dense(p, f"{lp}/mlp/lin1", queries).relu()
        queries = queries + dense(p, f"{lp}/mlp/lin2", z)
        queries = layer_norm(p, f"{lp}/norm3", queries, 1e-5)
        q = queries + point_embedding
        k = keys + key_pe
        keys = keys + tw_attention(
            p, f"{lp}/cross_attn_image_to_token", k, q, queries, num_heads)
        keys = layer_norm(p, f"{lp}/norm4", keys, 1e-5)
    q = queries + point_embedding
    k = keys + key_pe
    queries = queries + tw_attention(
        p, f"{prefix}/final_attn_token_to_image", q, k, keys, num_heads)
    queries = layer_norm(p, f"{prefix}/norm_final_attn", queries, 1e-5)
    return queries, keys


def _mlp(p, prefix, x, num_layers, relu_last=False):
    for i in range(num_layers):
        x = dense(p, f"{prefix}/layers_{i}", x)
        if i < num_layers - 1:
            x = x.relu()
    return x


def prompt_encoder_plain(p, *, points=None, boxes=None,
                         embed_dim, image_embedding_size, input_image_size):
    """Plain (non-class) SAM prompt encoder (``prompt_encoder.py:16-170``):
    positive/negative point embeddings 0/1, box corners 2/3."""
    if points is not None:
        bs = points[0].shape[0]
    elif boxes is not None:
        bs = boxes.shape[0]
    else:
        bs = 1
    sparse = torch.zeros(bs, 0, embed_dim)
    if points is not None:
        coords, labels = points
        pts = coords + 0.5
        if boxes is None:
            pts = torch.cat([pts, torch.zeros(pts.shape[0], 1, 2)], 1)
            labels = torch.cat(
                [labels, -torch.ones(labels.shape[0], 1, dtype=labels.dtype)], 1
            )
        c = pts.clone()
        c[..., 0] = c[..., 0] / input_image_size[1]
        c[..., 1] = c[..., 1] / input_image_size[0]
        pe = _pe_encoding(p, c)
        emb = p["prompt_encoder/point_embeddings"]
        invalid = (labels == -1)[..., None]
        pe = torch.where(invalid, p["prompt_encoder/not_a_point_embed"][0], pe)
        pe = pe + torch.where((labels == 0)[..., None], emb[0], torch.zeros(()))
        pe = pe + torch.where((labels == 1)[..., None], emb[1], torch.zeros(()))
        sparse = torch.cat([sparse, pe], 1)
    if boxes is not None:
        b = boxes + 0.5
        c = b.reshape(-1, 2, 2).clone()
        c[..., 0] = c[..., 0] / input_image_size[1]
        c[..., 1] = c[..., 1] / input_image_size[0]
        pe = _pe_encoding(p, c)
        emb = p["prompt_encoder/point_embeddings"]
        pe = pe.clone()
        pe[:, 0] = pe[:, 0] + emb[2]
        pe[:, 1] = pe[:, 1] + emb[3]
        sparse = torch.cat([sparse, pe.reshape(bs, -1, embed_dim)], 1)
    h, w = image_embedding_size
    dense_emb = (
        p["prompt_encoder/no_mask_embed"].reshape(1, 1, 1, -1)
        .expand(bs, h, w, embed_dim)
    )
    return sparse, dense_emb


def mask_decoder(p, prefix, tf_prefix, image_embeddings, image_pe, sparse,
                 dense_emb, *, num_mask_tokens, stages=4):
    bs = sparse.shape[0]
    output_tokens = torch.cat(
        [p[f"{prefix}/iou_token"], p[f"{prefix}/mask_tokens"]], 0
    )
    tokens = torch.cat(
        [output_tokens[None].expand(bs, -1, -1), sparse], 1
    )
    src = image_embeddings + dense_emb
    b, h, w, c = src.shape
    pos_src = image_pe.expand(b, -1, -1, -1)
    hs, src = twoway_transformer(p, tf_prefix, src, pos_src, tokens)
    iou_token_out = hs[:, 0]
    mask_tokens_out = hs[:, 1 : 1 + num_mask_tokens]
    src = src.reshape(b, h, w, c).permute(0, 3, 1, 2)
    x = src
    for i in range(stages):  # LayerNorm on every stage but the last
        x = conv_transpose2d(p, f"{prefix}/output_upscaling/up{i}", x)
        if i < stages - 1:
            x = layer_norm_2d(p, f"{prefix}/output_upscaling/norm{i}", x)
        x = F.gelu(x)
    upscaled = x.permute(0, 2, 3, 1)  # (B, h', w', C')
    hyper_in = torch.stack(
        [
            _mlp(p, f"{prefix}/hyper_mlp{i}", mask_tokens_out[:, i], 3)
            for i in range(num_mask_tokens)
        ],
        1,
    )
    masks = torch.einsum("btc,bhwc->bhwt", hyper_in, upscaled)
    iou_pred = _mlp(p, f"{prefix}/iou_head", iou_token_out, 3)
    return masks, iou_pred, upscaled


# ---------------------------------------------------------------------------
# dual-mask model
# ---------------------------------------------------------------------------


class TorchSamDualmask(nn.Module):
    def __init__(self, params, *, img_size, num_classes, num_decoders,
                 encoder_depth, encoder_num_heads,
                 encoder_global_attn_indexes, lora_rank=0, window_size=14):
        super().__init__()
        self.p = JaxParams(params)
        self.img_size = img_size
        self.num_classes = num_classes
        self.num_decoders = num_decoders
        self.encoder_depth = encoder_depth
        self.encoder_num_heads = encoder_num_heads
        self.encoder_global_attn_indexes = encoder_global_attn_indexes
        self.lora_rank = lora_rank
        self.window_size = window_size
        self.embed_dim = 256
        self.embedding_size = img_size // 16

    def preprocess(self, x_bhwc):
        mean = torch.tensor(PIXEL_MEAN)
        std = torch.tensor(PIXEL_STD)
        x = (x_bhwc - mean) / std
        h, w = x.shape[1], x.shape[2]
        return F.pad(x, (0, 0, 0, self.img_size - w, 0, self.img_size - h))

    def get_image_embeddings(self, x_bhwc):
        return image_encoder(
            self.p, self.preprocess(x_bhwc),
            depth=self.encoder_depth, num_heads=self.encoder_num_heads,
            window_size=self.window_size,
            global_attn_indexes=self.encoder_global_attn_indexes,
            lora_rank=self.lora_rank,
        )

    def _prompt_encoder(self, points=None, boxes=None, masks=None):
        return prompt_encoder(
            self.p, points=points, boxes=boxes, masks=masks,
            embed_dim=self.embed_dim,
            image_embedding_size=(self.embedding_size, self.embedding_size),
            input_image_size=(self.img_size, self.img_size),
        )

    def _run_decoder(self, idx, emb, sparse, dense_emb):
        # the transformer module is passed INTO the decoder core, so flax
        # names it under the outer decoder, not under /core
        return mask_decoder(
            self.p, f"mask_decoder{idx}/core", f"mask_decoder{idx}/transformer",
            emb,
            dense_pe(self.p, (self.embedding_size, self.embedding_size)),
            sparse, dense_emb, num_mask_tokens=self.num_classes + 1,
        )

    def postprocess_masks(self, masks_bhwt, image_size):
        x = masks_bhwt.permute(0, 3, 1, 2)
        x = F.interpolate(x, (self.img_size, self.img_size), mode="bilinear",
                          align_corners=False)
        x = x[:, :, :image_size, :image_size]
        x = F.interpolate(x, (image_size, image_size), mode="bilinear",
                          align_corners=False)
        return x.permute(0, 2, 3, 1)

    def forward_train(self, x_bhwc, image_size, prompt_idx=-1, prompts=None,
                      prompt_mode="point", image_embeddings=None):
        """Mirror of SamDualmask.forward_train with dropout_rate=0 and
        (for prompt_idx >= 0) injected prompts."""
        if image_embeddings is None:
            image_embeddings = self.get_image_embeddings(x_bhwc)
        sparse_d, dense_d = self._prompt_encoder()
        if prompt_idx >= 0:
            sparse_d = sparse_d.detach()
            dense_d = dense_d.detach()
        n = self.num_decoders
        low_res_logits = [None] * n
        low_res_logits_r = [None] * n
        dense_features = [None] * n
        for idx in range(n):
            if idx == prompt_idx:
                continue
            low_res_logits[idx], _, dense_features[idx] = self._run_decoder(
                idx, image_embeddings, sparse_d, dense_d
            )
        if 0 <= prompt_idx < n:
            (points, points_r, fit_boxes, loose_boxes, mask_prompt) = prompts
            if prompt_mode == "point":
                sparse, dense_emb = self._prompt_encoder(points=points)
                sparse_r, _ = self._prompt_encoder(points=points_r)
            elif prompt_mode == "box":
                sparse, dense_emb = self._prompt_encoder(boxes=fit_boxes)
                sparse_r, _ = self._prompt_encoder(boxes=loose_boxes)
            elif prompt_mode == "all":
                sparse, dense_emb = self._prompt_encoder(
                    points=points, boxes=fit_boxes, masks=mask_prompt)
                sparse_r, _ = self._prompt_encoder(
                    points=points_r, boxes=loose_boxes, masks=mask_prompt)
            else:
                raise ValueError(prompt_mode)
            low_res_logits[prompt_idx], _, dense_features[prompt_idx] = (
                self._run_decoder(prompt_idx, image_embeddings, sparse,
                                  dense_emb)
            )
            low_res_logits_r[prompt_idx], _, _ = self._run_decoder(
                prompt_idx, image_embeddings, sparse_r, dense_emb
            )
        return {
            "low_res_logits": low_res_logits,
            "low_res_logits_r": low_res_logits_r,
            "dense_features": dense_features,
        }


def torch_dice_ce(logits_bhwc, targets, dice_w, classes):
    """(1-w)*CE + w*Dice — mirror of the CPCSAM _supervised composition
    (DiceAndCELoss smooth 1e-5, do_bg=True, per-sample unsquared dice)."""
    logits = logits_bhwc.permute(0, 3, 1, 2)
    ce = F.cross_entropy(logits, targets)
    probs = logits.softmax(1)
    onehot = F.one_hot(targets, classes).permute(0, 3, 1, 2).float()
    intersect = (probs * onehot).sum((2, 3))
    dice = 1.0 - (2 * intersect + 1e-5) / (
        probs.sum((2, 3)) + onehot.sum((2, 3)) + 1e-5
    )
    return (1.0 - dice_w) * ce + dice_w * dice.mean()
