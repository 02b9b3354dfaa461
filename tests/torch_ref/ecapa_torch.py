"""Minimal PyTorch mirror of the Pretssel ECAPA-TDNN prosody encoder
(reference ``prosody_encoder.py:30-334``), used only to generate golden
activations for conversion-parity tests. Matches the reference layer
structure/state-dict keys; written independently for the test suite."""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn


class TDNN(nn.Module):
    def __init__(self, cin, cout, k, d=1, groups=1):
        super().__init__()
        self.conv = nn.Conv1d(cin, cout, k, dilation=d,
                              padding=d * (k - 1) // 2, groups=groups)
        self.norm = nn.LayerNorm(cout, eps=1e-12)

    def forward(self, x):  # [B, C, T]
        return self.norm(F.relu(self.conv(x)).transpose(1, 2)).transpose(1, 2)


class Res2Net(nn.Module):
    def __init__(self, c, scale, k, d):
        super().__init__()
        h = c // scale
        self.blocks = nn.ModuleList([TDNN(h, h, k, d) for _ in range(scale - 1)])
        self.scale = scale

    def forward(self, x):
        xs = torch.chunk(x, self.scale, dim=1)
        ys = []
        for i, xi in enumerate(xs):
            if i == 0:
                y = xi
            elif i == 1:
                y = self.blocks[0](xi)
            else:
                y = self.blocks[i - 1](xi + y)
            ys.append(y)
        return torch.cat(ys, dim=1)


class SE(nn.Module):
    def __init__(self, c, se, cout):
        super().__init__()
        self.conv1 = nn.Conv1d(c, se, 1)
        self.conv2 = nn.Conv1d(se, cout, 1)

    def forward(self, x):
        s = x.mean(dim=2, keepdim=True)
        return torch.sigmoid(self.conv2(F.relu(self.conv1(s)))) * x


class SERes2Net(nn.Module):
    def __init__(self, cin, cout, scale, se, k, d):
        super().__init__()
        self.tdnn1 = TDNN(cin, cout, 1)
        self.res2net_block = Res2Net(cout, scale, k, d)
        self.tdnn2 = TDNN(cout, cout, 1)
        self.se_block = SE(cout, se, cout)
        self.shortcut = nn.Conv1d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        r = self.shortcut(x) if self.shortcut is not None else x
        return self.se_block(self.tdnn2(self.res2net_block(self.tdnn1(x)))) + r


class ASP(nn.Module):
    def __init__(self, c, attn_c, global_context=True):
        super().__init__()
        self.global_context = global_context
        self.tdnn = TDNN(c * 3 if global_context else c, attn_c, 1)
        self.conv = nn.Conv1d(attn_c, c, 1)

    def forward(self, x):  # [B, C, T]
        B, C, T = x.shape
        if self.global_context:
            mean = x.mean(dim=2, keepdim=True).expand(-1, -1, T)
            std = torch.sqrt(
                (x - x.mean(dim=2, keepdim=True)).pow(2).mean(dim=2).clamp(1e-12)
            ).unsqueeze(2).expand(-1, -1, T)
            a = torch.cat([x, mean, std], dim=1)
        else:
            a = x
        a = self.conv(torch.tanh(self.tdnn(a)))
        w = F.softmax(a, dim=2)
        mean = (w * x).sum(dim=2)
        std = torch.sqrt((w * (x - mean.unsqueeze(2)).pow(2)).sum(dim=2).clamp(1e-12))
        return torch.cat([mean, std], dim=1).unsqueeze(2)


class EcapaTorch(nn.Module):
    """State-dict keys: blocks.{i}.*, mfa.*, asp.*, asp_norm.*, fc.*"""

    def __init__(self, channels, kernels, dilations, attn_c, scale, se, embed, cin):
        super().__init__()
        blocks = [TDNN(cin, channels[0], kernels[0], dilations[0])]
        for i in range(1, len(channels) - 1):
            blocks.append(SERes2Net(channels[i - 1], channels[i], scale, se,
                                    kernels[i], dilations[i]))
        self.blocks = nn.ModuleList(blocks)
        cat = sum(channels[1:-1])
        self.mfa = TDNN(cat, channels[-1], kernels[-1], dilations[-1])
        self.asp = ASP(channels[-1], attn_c)
        self.asp_norm = nn.LayerNorm(channels[-1] * 2, eps=1e-12)
        self.fc = nn.Conv1d(channels[-1] * 2, embed, 1)

    def forward(self, x):  # [B, T, C]
        x = x.transpose(1, 2)
        feats = []
        for b in self.blocks:
            x = b(x)
            feats.append(x)
        x = self.mfa(torch.cat(feats[1:], dim=1))
        x = self.asp(x)
        x = self.asp_norm(x.transpose(1, 2)).transpose(1, 2)
        x = self.fc(x).transpose(1, 2).squeeze(1)
        return F.normalize(x, dim=-1)
