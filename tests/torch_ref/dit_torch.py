"""Compact plain-torch mirror of the reference DiT (dit.py:105-254,
modules.py:149-731) used ONLY as a parity oracle in tests.

State-dict key names match the reference layout so the production converter
(`lemas_tts_tpu.infer.checkpoints.convert_dit`) runs on it unchanged — the
test therefore validates model numerics AND weight conversion end-to-end.
"""

import math

import torch
import torch.nn.functional as F
from torch import nn


def rope_apply(t, angles):
    # interleaved-pair convention (x_transformers apply_rotary_pos_emb)
    cos, sin = angles.cos(), angles.sin()
    even, odd = t[..., 0::2], t[..., 1::2]
    out = torch.stack([even * cos - odd * sin, odd * cos + even * sin], dim=-1)
    return out.flatten(-2)


class GRN(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.zeros(1, 1, dim))
        self.beta = nn.Parameter(torch.zeros(1, 1, dim))

    def forward(self, x):
        gx = torch.norm(x, p=2, dim=1, keepdim=True)
        nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
        return self.gamma * (x * nx) + self.beta + x


class ConvNeXtV2Block(nn.Module):
    def __init__(self, dim, inter):
        super().__init__()
        self.dwconv = nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, inter)
        self.grn = GRN(inter)
        self.pwconv2 = nn.Linear(inter, dim)

    def forward(self, x):
        r = x
        x = self.dwconv(x.transpose(1, 2)).transpose(1, 2)
        x = self.pwconv1(self.norm(x))
        x = self.pwconv2(self.grn(F.gelu(x)))
        return r + x


class SinusPos(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dim = dim

    def forward(self, x, scale=1000):
        half = self.dim // 2
        emb = torch.exp(torch.arange(half).float() * -(math.log(10000) / (half - 1)))
        emb = scale * x.unsqueeze(1) * emb.unsqueeze(0)
        return torch.cat((emb.sin(), emb.cos()), dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, dim, freq_dim=256):
        super().__init__()
        self.time_embed = SinusPos(freq_dim)
        self.time_mlp = nn.Sequential(nn.Linear(freq_dim, dim), nn.SiLU(), nn.Linear(dim, dim))

    def forward(self, t):
        return self.time_mlp(self.time_embed(t))


def abs_pos_table(dim, max_pos, theta=10000.0):
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim))
    f = torch.outer(torch.arange(max_pos).float(), freqs)
    return torch.cat([f.cos(), f.sin()], dim=-1)


class TextEmbedding(nn.Module):
    def __init__(self, n_embeds, dim, conv_layers=0, conv_mult=2, max_pos=4096):
        super().__init__()
        self.text_embed = nn.Embedding(n_embeds + 1, dim)
        self.max_pos = max_pos
        self.extra = conv_layers > 0
        if self.extra:
            self.register_buffer("freqs_cis", abs_pos_table(dim, max_pos), persistent=False)
            self.text_blocks = nn.Sequential(
                *[ConvNeXtV2Block(dim, dim * conv_mult) for _ in range(conv_layers)]
            )

    def forward(self, text, seq_len, drop_text=False):
        text = (text + 1)[:, :seq_len]
        text = F.pad(text, (0, seq_len - text.shape[1]), value=0)
        pad_mask = text == 0
        if drop_text:
            text = torch.zeros_like(text)
        x = self.text_embed(text)
        if self.extra:
            pos = torch.arange(seq_len).clamp(max=self.max_pos - 1)
            x = x + self.freqs_cis[pos].unsqueeze(0)
            x = x.masked_fill(pad_mask.unsqueeze(-1), 0.0)
            for blk in self.text_blocks:
                x = blk(x).masked_fill(pad_mask.unsqueeze(-1), 0.0)
        return x


class ConvPositionEmbedding(nn.Module):
    def __init__(self, dim, k=31, groups=16):
        super().__init__()
        self.conv1d = nn.Sequential(
            nn.Conv1d(dim, dim, k, groups=groups, padding=k // 2),
            nn.Mish(),
            nn.Conv1d(dim, dim, k, groups=groups, padding=k // 2),
            nn.Mish(),
        )

    def forward(self, x):
        return self.conv1d(x.permute(0, 2, 1)).permute(0, 2, 1)


class InputEmbedding(nn.Module):
    def __init__(self, mel_dim, text_dim, out_dim):
        super().__init__()
        self.proj = nn.Linear(mel_dim * 2 + text_dim, out_dim)
        self.conv_pos_embed = ConvPositionEmbedding(out_dim)

    def forward(self, x, cond, text_embed, drop_audio_cond=False):
        if drop_audio_cond:
            cond = torch.zeros_like(cond)
        x = self.proj(torch.cat((x, cond, text_embed), dim=-1))
        return self.conv_pos_embed(x) + x


class Attention(nn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        self.heads, self.dim_head = heads, dim_head
        inner = heads * dim_head
        self.to_q = nn.Linear(dim, inner)
        self.to_k = nn.Linear(dim, inner)
        self.to_v = nn.Linear(dim, inner)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim), nn.Dropout(0.0)])

    def forward(self, x, mask=None, angles=None):
        B, N, _ = x.shape
        q = self.to_q(x).view(B, N, self.heads, self.dim_head).transpose(1, 2)
        k = self.to_k(x).view(B, N, self.heads, self.dim_head).transpose(1, 2)
        v = self.to_v(x).view(B, N, self.heads, self.dim_head).transpose(1, 2)
        if angles is not None:
            q, k = rope_apply(q, angles), rope_apply(k, angles)
        attn_mask = None
        if mask is not None:
            attn_mask = mask[:, None, None, :].expand(B, self.heads, N, N)
        out = F.scaled_dot_product_attention(q, k, v, attn_mask=attn_mask)
        out = out.transpose(1, 2).reshape(B, N, -1)
        out = self.to_out[1](self.to_out[0](out))
        if mask is not None:
            out = out.masked_fill(~mask.unsqueeze(-1), 0.0)
        return out


class AdaLayerNorm(nn.Module):
    def __init__(self, dim, n_chunks=6):
        super().__init__()
        self.linear = nn.Linear(dim, dim * n_chunks)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)


class DiTBlock(nn.Module):
    def __init__(self, dim, heads, dim_head, ff_mult):
        super().__init__()
        self.attn_norm = AdaLayerNorm(dim)
        self.attn = Attention(dim, heads, dim_head)
        self.ff_norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = FeedForward(dim, ff_mult)

    def forward(self, x, t, mask=None, angles=None):
        mod = self.attn_norm.linear(F.silu(t))
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = mod.chunk(6, dim=1)
        normed = self.attn_norm.norm(x) * (1 + sc_a[:, None]) + sh_a[:, None]
        x = x + g_a.unsqueeze(1) * self.attn(normed, mask=mask, angles=angles)
        normed = self.ff_norm(x) * (1 + sc_m[:, None]) + sh_m[:, None]
        return x + g_m.unsqueeze(1) * self.ff(normed)


class FeedForward(nn.Module):
    def __init__(self, dim, mult):
        super().__init__()
        self.ff = nn.Sequential(
            nn.Sequential(nn.Linear(dim, dim * mult), nn.GELU(approximate="tanh")),
            nn.Dropout(0.0),
            nn.Linear(dim * mult, dim),
        )

    def forward(self, x):
        return self.ff(x)


class AdaLayerNormFinal(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.linear = nn.Linear(dim, dim * 2)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, t):
        scale, shift = self.linear(F.silu(t)).chunk(2, dim=1)
        return self.norm(x) * (1 + scale)[:, None] + shift[:, None]


class DiTRef(nn.Module):
    def __init__(self, *, dim, depth, heads, dim_head, ff_mult, mel_dim,
                 text_num_embeds, text_dim, conv_layers):
        super().__init__()
        self.time_embed = TimestepEmbedding(dim)
        self.text_embed = TextEmbedding(text_num_embeds, text_dim, conv_layers)
        self.input_embed = InputEmbedding(mel_dim, text_dim, dim)
        self.dim_head = dim_head
        self.transformer_blocks = nn.ModuleList(
            [DiTBlock(dim, heads, dim_head, ff_mult) for _ in range(depth)]
        )
        self.norm_out = AdaLayerNormFinal(dim)
        self.proj_out = nn.Linear(dim, mel_dim)

    def rope(self, n):
        inv = 1.0 / (10000.0 ** (torch.arange(0, self.dim_head, 2).float() / self.dim_head))
        return torch.outer(torch.arange(n).float(), inv)

    def forward(self, x, cond, text, time, mask=None, drop_audio_cond=False, drop_text=False):
        B, N = x.shape[0], x.shape[1]
        if time.ndim == 0:
            time = time.repeat(B)
        t = self.time_embed(time)
        te = self.text_embed(text, N, drop_text=drop_text)
        h = self.input_embed(x, cond, te, drop_audio_cond=drop_audio_cond)
        angles = self.rope(N)
        for blk in self.transformer_blocks:
            h = blk(h, t, mask=mask, angles=angles)
        return self.proj_out(self.norm_out(h, t))
