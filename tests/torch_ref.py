"""Minimal PyTorch mirror of the reference UNet used ONLY to generate golden
values and state_dicts with reference-compatible parameter names
(``encoder.levels.{l}.{b}.all.*``, ``decoder.upsamples.{l}``, ...). This is
test scaffolding for parity checks of the JAX implementation."""

import torch
import torch.nn as nn


class _Block(nn.Module):
    def __init__(self, cin, cout, stride, norm="batch", block="plain", dropout=None):
        super().__init__()
        conv = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=True)
        do = nn.Identity() if dropout is None else nn.Dropout2d(dropout)
        norm_m = (
            nn.BatchNorm2d(cout, eps=1e-5)
            if norm == "batch"
            else nn.InstanceNorm2d(cout, eps=1e-5, affine=True)
        )
        act = nn.LeakyReLU()
        if block == "plain":
            self.all = nn.Sequential(conv, do, norm_m, act)
            self.is_res = False
        else:
            self.all = nn.Sequential(conv, norm_m, do, act)
            self.is_res = True
            if cin != cout or stride != 1:
                self.downsample_skip = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=True),
                    nn.BatchNorm2d(cout, eps=1e-5)
                    if norm == "batch"
                    else nn.InstanceNorm2d(cout, eps=1e-5, affine=True),
                )
            else:
                self.downsample_skip = nn.Identity()

    def forward(self, x):
        out = self.all(x)
        if self.is_res:
            return out + self.downsample_skip(x)
        return out


class _Encoder(nn.Module):
    def __init__(self, cin, channels, **kw):
        super().__init__()
        self.levels = nn.ModuleList()
        prev = cin
        for l, c in enumerate(channels):
            s = 1 if l == 0 else 2
            self.levels.append(
                nn.Sequential(_Block(prev, c, s, **kw), _Block(c, c, 1, **kw))
            )
            prev = c

    def forward(self, x):
        skips = []
        for lvl in self.levels:
            x = lvl(x)
            skips.append(x)
        return skips


class _Decoder(nn.Module):
    def __init__(self, classes, channels_down, **kw):
        super().__init__()
        self.upsamples = nn.ModuleList()
        self.levels = nn.ModuleList()
        for l in range(len(channels_down) - 1):
            cin, cout = channels_down[l], channels_down[l + 1]
            self.upsamples.append(nn.ConvTranspose2d(cin, cout, 2, 2))
            self.levels.append(
                nn.Sequential(_Block(cout * 2, cout, 1, **kw), _Block(cout, cout, 1, **kw))
            )
        self.seg_output = nn.Conv2d(channels_down[-1], classes, 1)

    def forward(self, skips):
        skips = skips[::-1]
        x = skips[0]
        for l, feat in enumerate(skips[1:]):
            x = self.upsamples[l](x)
            x = torch.cat([feat, x], dim=1)
            x = self.levels[l](x)
        return self.seg_output(x)


class TorchUNet(nn.Module):
    def __init__(self, cin, classes, channels, norm="batch", block="plain", dropout=None):
        super().__init__()
        kw = dict(norm=norm, block=block, dropout=dropout)
        self.encoder = _Encoder(cin, channels, **kw)
        self.decoder = _Decoder(classes, list(channels)[::-1], **kw)

    def forward(self, x):
        return self.decoder(self.encoder(x))

    def enc_feature(self, x):
        bottleneck = self.encoder(x)[-1]
        return bottleneck.mean(dim=(2, 3))
