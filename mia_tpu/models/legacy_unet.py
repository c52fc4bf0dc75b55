"""Legacy fixed UNet (reference ``src/models/_unet.py``) in Flax.

The classic 64→1024 maxpool UNet that FUGC-2025-era checkpoints target
(``entry/fugc2025/predict.py:29`` builds ``UNet(3, 3)`` of this class).
Channel-last; LeakyReLU default slope 0.01 (torch ``nn.LeakyReLU()``),
BatchNorm, optional bilinear upsampling with halved mid-channels,
``init_head``-style late head via ``n_classes=None`` + ``head_logits``.
Includes a torch-checkpoint importer for the ``fold_*/checkpoint_best.pth``
ensemble files.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LegacyUNetConfig:
    n_channels: int = 3
    n_classes: int | None = 3
    bilinear: bool = False
    width: int = 64  # reference hard-codes 64; scalable for tests
    compute_dtype: jnp.dtype = jnp.float32


class DoubleConv(nn.Module):
    cfg: LegacyUNetConfig
    out_channels: int
    mid_channels: int | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        mid = self.mid_channels or self.out_channels
        for i, feats in enumerate((mid, self.out_channels)):
            x = nn.Conv(
                feats,
                (3, 3),
                padding=1,
                use_bias=False,
                dtype=self.cfg.compute_dtype,
                name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.cfg.compute_dtype,
                name=f"norm{i}",
            )(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        return x


class LegacyUNet(nn.Module):
    cfg: LegacyUNetConfig

    def setup(self):
        cfg = self.cfg
        factor = 2 if cfg.bilinear else 1
        w = cfg.width
        self.inc = DoubleConv(cfg, w)
        self.downs = [
            DoubleConv(cfg, c) for c in (w * 2, w * 4, w * 8, w * 16 // factor)
        ]
        up_out = (w * 8 // factor, w * 4 // factor, w * 2 // factor, w)
        up_in = (w * 16, w * 8, w * 4, w * 2)
        if cfg.bilinear:
            self.up_convs = [
                DoubleConv(cfg, o, i // 2) for i, o in zip(up_in, up_out)
            ]
        else:
            self.up_tconvs = [
                nn.ConvTranspose(
                    i // 2,
                    (2, 2),
                    strides=(2, 2),
                    padding="VALID",
                    dtype=cfg.compute_dtype,
                    name=f"up_tconv{k}",
                )
                for k, i in enumerate(up_in)
            ]
            self.up_convs = [DoubleConv(cfg, o) for o in up_out]
        if cfg.n_classes is not None:
            self.outc = nn.Conv(cfg.n_classes, (1, 1), dtype=cfg.compute_dtype)

    def _up(self, k, x1, x2, train):
        cfg = self.cfg
        if cfg.bilinear:
            h, w = x1.shape[1] * 2, x1.shape[2] * 2
            # torch Upsample(bilinear, align_corners=True)
            from ..ops import resize

            x1 = resize(x1, (h, w), "bilinear", antialias=False, align_corners=True)
        else:
            x1 = self.up_tconvs[k](x1)
        dy = x2.shape[1] - x1.shape[1]
        dx = x2.shape[2] - x1.shape[2]
        x1 = jnp.pad(
            x1,
            ((0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2), (0, 0)),
        )
        x = jnp.concatenate([x2, x1], axis=-1)
        return self.up_convs[k](x, train)

    def __call__(self, x, train: bool = False):
        x = x.astype(self.cfg.compute_dtype)
        x1 = self.inc(x, train)
        feats = [x1]
        h = x1
        for down in self.downs:
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = down(h, train)
            feats.append(h)
        x = feats[-1]
        for k in range(4):
            x = self._up(k, x, feats[-(k + 2)], train)
        if self.cfg.n_classes is None:
            return x
        return self.outc(x)


def _dc(sd, prefix):
    p, s = {}, {}
    for i, (ci, ni) in enumerate(((0, 1), (3, 4))):
        w = np.asarray(sd[f"{prefix}.{ci}.weight"], np.float32)
        p[f"conv{i}"] = {"kernel": w.transpose(2, 3, 1, 0)}
        p[f"norm{i}"] = {
            "scale": np.asarray(sd[f"{prefix}.{ni}.weight"], np.float32),
            "bias": np.asarray(sd[f"{prefix}.{ni}.bias"], np.float32),
        }
        s[f"norm{i}"] = {
            "mean": np.asarray(sd[f"{prefix}.{ni}.running_mean"], np.float32),
            "var": np.asarray(sd[f"{prefix}.{ni}.running_var"], np.float32),
        }
    return p, s


def import_legacy_torch_checkpoint(state_dict) -> dict:
    """Reference ``_UNet`` state_dict → LegacyUNet flax variables
    (non-bilinear layout used by the FUGC fold checkpoints)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}
    params["inc"], stats["inc"] = _dc(sd, "inc.double_conv")
    for i in range(4):
        p, s = _dc(sd, f"down{i + 1}.maxpool_conv.1.double_conv")
        params[f"downs_{i}"], stats[f"downs_{i}"] = p, s
    for i in range(4):
        w = np.asarray(sd[f"up{i + 1}.up.weight"], np.float32)
        params[f"up_tconv{i}"] = {
            "kernel": w.transpose(2, 3, 0, 1)[::-1, ::-1].copy(),
            "bias": np.asarray(sd[f"up{i + 1}.up.bias"], np.float32),
        }
        p, s = _dc(sd, f"up{i + 1}.conv.double_conv")
        params[f"up_convs_{i}"], stats[f"up_convs_{i}"] = p, s
    params["outc"] = {
        "kernel": np.asarray(sd["outc.conv.weight"], np.float32).transpose(2, 3, 1, 0),
        "bias": np.asarray(sd["outc.conv.bias"], np.float32),
    }
    return {"params": params, "batch_stats": stats}
