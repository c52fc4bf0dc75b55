"""Import reference PyTorch UNet checkpoints into Flax variables.

Honors the FUGC "initial round" workflow (reference ``README.md:17-18``,
``al_trainer.py:518-535``): round-0 checkpoints trained with the PyTorch
stack load directly into the TPU model.

Key layout conversions (torch -> flax, channel-last):
- Conv2d weight (O, I, kh, kw)         -> kernel (kh, kw, I, O)
- ConvTranspose2d weight (I, O, kh, kw)-> kernel (kh, kw, I, O), spatially
  flipped (lax.conv_transpose correlates while torch's transposed conv
  convolves; verified by the parity tests in tests/test_unet.py)
- BatchNorm weight/bias/running_*      -> scale/bias + batch_stats mean/var
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _conv(sd, key):
    w = np.asarray(sd[f"{key}.weight"], dtype=np.float32)
    b = np.asarray(sd[f"{key}.bias"], dtype=np.float32)
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}


def _conv_transpose(sd, key):
    w = np.asarray(sd[f"{key}.weight"], dtype=np.float32)
    b = np.asarray(sd[f"{key}.bias"], dtype=np.float32)
    kernel = w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    return {"kernel": kernel, "bias": b}


def _norm_params(sd, key):
    return {
        "scale": np.asarray(sd[f"{key}.weight"], dtype=np.float32),
        "bias": np.asarray(sd[f"{key}.bias"], dtype=np.float32),
    }


def _norm_stats(sd, key):
    if f"{key}.running_mean" not in sd:
        return None
    return {
        "mean": np.asarray(sd[f"{key}.running_mean"], dtype=np.float32),
        "var": np.asarray(sd[f"{key}.running_var"], dtype=np.float32),
    }


def _block(sd, prefix, block_type):
    """One PlainBlock/ResidualBlock. torch indices: plain all=(conv,do,norm,
    act) -> conv=.all.0, norm=.all.2; res all=(conv,norm,do,act) ->
    conv=.all.0, norm=.all.1 (+ downsample_skip.0/.1)."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    norm_idx = 2 if block_type == "plain" else 1
    params["conv"] = _conv(sd, f"{prefix}.all.0")
    params["norm"] = _norm_params(sd, f"{prefix}.all.{norm_idx}")
    s = _norm_stats(sd, f"{prefix}.all.{norm_idx}")
    if s:
        stats["norm"] = s
    if f"{prefix}.downsample_skip.0.weight" in sd:
        params["skip_conv"] = _conv(sd, f"{prefix}.downsample_skip.0")
        params["skip_norm"] = _norm_params(sd, f"{prefix}.downsample_skip.1")
        s = _norm_stats(sd, f"{prefix}.downsample_skip.1")
        if s:
            stats["skip_norm"] = s
    return params, stats


def import_torch_unet_checkpoint(
    state_dict: Mapping[str, Any],
    num_levels: int,
    block_type: str = "plain",
    deep_supervision_layers: tuple[int, ...] = (),
) -> dict:
    """Convert a reference UNet torch state_dict into flax ``variables``.

    ``state_dict`` values may be torch tensors or numpy arrays. Returns
    ``{"params": ..., "batch_stats": ...}`` (batch_stats present only for
    batch normalization).
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    enc_params: dict[str, Any] = {}
    enc_stats: dict[str, Any] = {}
    for level in range(num_levels):
        for b in range(2):
            p, s = _block(sd, f"encoder.levels.{level}.{b}", block_type)
            enc_params[f"level{level}_block{b}"] = p
            if s:
                enc_stats[f"level{level}_block{b}"] = s

    dec_params: dict[str, Any] = {}
    dec_stats: dict[str, Any] = {}
    num_upsample = num_levels - 1
    for l in range(num_upsample):
        dec_params[f"up{l}"] = _conv_transpose(sd, f"decoder.upsamples.{l}")
        for b in range(2):
            p, s = _block(sd, f"decoder.levels.{l}.{b}", block_type)
            dec_params[f"level{l}_block{b}"] = p
            if s:
                dec_stats[f"level{l}_block{b}"] = s
    dec_params["seg_output"] = _conv(sd, "decoder.seg_output")
    for l in deep_supervision_layers:
        if f"decoder.ds.{l}.0.weight" in sd:
            dec_params[f"ds{l}_conv"] = _conv(sd, f"decoder.ds.{l}.0")

    variables: dict[str, Any] = {
        "params": {"encoder": enc_params, "decoder": dec_params}
    }
    if enc_stats or dec_stats:
        variables["batch_stats"] = {"encoder": enc_stats, "decoder": dec_stats}
    return variables


def _to_numpy(v):
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)
