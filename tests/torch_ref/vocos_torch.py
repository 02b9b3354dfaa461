"""Compact torch mirror of the Vocos vocoder (charactr/vocos architecture) used
as a parity oracle; state-dict keys match the published checkpoint layout."""

import torch
from torch import nn


class ConvNeXtBlock(nn.Module):
    def __init__(self, dim, inter):
        super().__init__()
        self.dwconv = nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, inter)
        self.pwconv2 = nn.Linear(inter, dim)
        self.gamma = nn.Parameter(torch.ones(dim))

    def forward(self, x):  # [B, C, T]
        r = x
        x = self.dwconv(x).transpose(1, 2)
        x = self.pwconv2(torch.nn.functional.gelu(self.pwconv1(self.norm(x))))
        return r + (self.gamma * x).transpose(1, 2)


class Backbone(nn.Module):
    def __init__(self, in_ch=100, dim=512, inter=1536, layers=8):
        super().__init__()
        self.embed = nn.Conv1d(in_ch, dim, 7, padding=3)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.convnext = nn.ModuleList([ConvNeXtBlock(dim, inter) for _ in range(layers)])
        self.final_layer_norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, mel):  # [B, n_mels, T]
        x = self.embed(mel)
        x = self.norm(x.transpose(1, 2)).transpose(1, 2)
        for blk in self.convnext:
            x = blk(x)
        return self.final_layer_norm(x.transpose(1, 2))  # [B, T, C]


class Head(nn.Module):
    def __init__(self, dim=512, n_fft=1024, hop=256):
        super().__init__()
        self.out = nn.Linear(dim, n_fft + 2)
        self.n_fft, self.hop = n_fft, hop

    def forward(self, x):  # [B, T, C]
        h = self.out(x).transpose(1, 2)
        n_bins = self.n_fft // 2 + 1
        mag = torch.exp(h[:, :n_bins]).clip(max=1e2)
        p = h[:, n_bins:]
        spec = mag * (torch.cos(p) + 1j * torch.sin(p))
        window = torch.hann_window(self.n_fft)
        return torch.istft(spec, self.n_fft, self.hop, window=window, center=True)


class VocosRef(nn.Module):
    def __init__(self, in_ch=100, dim=512, inter=1536, layers=8, n_fft=1024, hop=256):
        super().__init__()
        self.backbone = Backbone(in_ch, dim, inter, layers)
        self.head = Head(dim, n_fft, hop)

    def decode(self, mel):
        return self.head(self.backbone(mel))

    def ckpt_state_dict(self):
        """state dict with published-checkpoint key names (head.out.*)."""
        sd = {f"backbone.{k}": v for k, v in self.backbone.state_dict().items()}
        sd.update({f"head.{k}": v for k, v in self.head.state_dict().items()})
        return sd
