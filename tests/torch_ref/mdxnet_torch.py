"""Minimal PyTorch mirror of MDX-Net ConvTDFNet (reference
``uvr5/lib_v5/mdxnet.py:34-124`` + ``modules.py``), for conversion-parity
tests. State-dict keys match the reference naming that the converter expects."""

from __future__ import annotations

import torch
import torch.nn as nn


def gnorm(c):
    return nn.GroupNorm(2, c)


class TFCTorch(nn.Module):
    def __init__(self, c, l, k):
        super().__init__()
        self.H = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(c, c, k, 1, k // 2), gnorm(c), nn.ReLU())
             for _ in range(l)]
        )

    def forward(self, x):
        for h in self.H:
            x = h(x)
        return x


class TFCTDFTorch(nn.Module):
    def __init__(self, c, l, f, k, bn, bias):
        super().__init__()
        self.tfc = TFCTorch(c, l, k)
        if bn == 0:
            self.tdf = nn.Sequential(nn.Linear(f, f, bias=bias), gnorm(c), nn.ReLU())
        else:
            self.tdf = nn.Sequential(
                nn.Linear(f, f // bn, bias=bias), gnorm(c), nn.ReLU(),
                nn.Linear(f // bn, f, bias=bias), gnorm(c), nn.ReLU(),
            )

    def forward(self, x):
        x = self.tfc(x)
        return x + self.tdf(x)


class ConvTDFNetTorch(nn.Module):
    def __init__(self, dim_c, dim_f, num_blocks, l, g, k, bn, bias):
        super().__init__()
        self.n = num_blocks // 2
        self.dim_c = dim_c
        self.first_conv = nn.Sequential(nn.Conv2d(dim_c, g, 1), gnorm(g), nn.ReLU())
        f, c = dim_f, g
        self.encoding_blocks = nn.ModuleList()
        self.ds = nn.ModuleList()
        for _ in range(self.n):
            self.encoding_blocks.append(TFCTDFTorch(c, l, f, k, bn, bias))
            self.ds.append(nn.Sequential(
                nn.Conv2d(c, c + g, (2, 2), (2, 2)), gnorm(c + g), nn.ReLU()))
            f //= 2
            c += g
        self.bottleneck_block = TFCTDFTorch(c, l, f, k, bn, bias)
        self.decoding_blocks = nn.ModuleList()
        self.us = nn.ModuleList()
        for _ in range(self.n):
            self.us.append(nn.Sequential(
                nn.ConvTranspose2d(c, c - g, (2, 2), (2, 2)), gnorm(c - g), nn.ReLU()))
            f *= 2
            c -= g
            self.decoding_blocks.append(TFCTDFTorch(c, l, f, k, bn, bias))
        self.final_conv = nn.Sequential(nn.Conv2d(c, dim_c, 1))

    def forward(self, x):  # [B, C, F, T]
        x = self.first_conv(x)
        x = x.transpose(-1, -2)  # [B, C, T, F]
        skips = []
        for i in range(self.n):
            x = self.encoding_blocks[i](x)
            skips.append(x)
            x = self.ds[i](x)
        x = self.bottleneck_block(x)
        for i in range(self.n):
            x = self.us[i](x)
            x = x * skips[-i - 1]
            x = self.decoding_blocks[i](x)
        x = x.transpose(-1, -2)
        return self.final_conv(x)
