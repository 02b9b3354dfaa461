"""Speaker encoder: SpeechBrain-style ECAPA-TDNN in flax (trainable).

The reference instantiates this optional component when ``use_spk_enc=True``
(``cfm.py:150-163``; disabled in every shipped config) using the SpeechBrain
ECAPA recipe (``backbones/ecapa_tdnn.py:791-926``): mel [B, T, D] →
192/dim-d speaker embedding, with **BatchNorm** (vs the prosody encoder's
LayerNorm), res2net_scale 4, and a final linear projection. Paired with the
InfoNCE objective (:func:`lemas_tts_tpu.cfm.loss.info_nce_speaker`).

Differences from :mod:`lemas_tts_tpu.models.prosody` are exactly the
reference's: norm type, scale, output projection — so both live as separate
modules rather than one over-parameterized class.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class SpeakerConfig:
    input_dim: int = 100  # mel channels (cfm.py:151)
    embed_dim: int = 1024  # transformer dim (cfm.py:152)
    channels: Tuple[int, ...] = (512, 512, 512, 512, 1536)
    kernel_sizes: Tuple[int, ...] = (5, 3, 3, 3, 1)
    dilations: Tuple[int, ...] = (1, 2, 3, 4, 1)
    attention_channels: int = 128
    res2net_scale: int = 4
    se_channels: int = 128
    global_context: bool = True


class _BNTDNN(nn.Module):
    """conv1d → ReLU → BatchNorm (SpeechBrain TDNNBlock order)."""

    out_channels: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = self.dilation * (self.kernel_size - 1) // 2
        x = nn.Conv(self.out_channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding=[(pad, pad)],
                    name="conv")(x)
        x = nn.relu(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class _Res2Net(nn.Module):
    out_channels: int
    scale: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = self.out_channels // self.scale
        chunks = jnp.split(x, self.scale, axis=-1)
        ys: List[jax.Array] = []
        y = None
        for i, xi in enumerate(chunks):
            if i == 0:
                y = xi
            elif i == 1:
                y = _BNTDNN(hidden, self.kernel_size, self.dilation,
                            name=f"block_{i - 1}")(xi, train)
            else:
                y = _BNTDNN(hidden, self.kernel_size, self.dilation,
                            name=f"block_{i - 1}")(xi + y, train)
            ys.append(y)
        return jnp.concatenate(ys, axis=-1)


class _SE(nn.Module):
    se_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = x.mean(axis=1, keepdims=True)
        s = nn.relu(nn.Conv(self.se_channels, (1,), name="conv1")(s))
        s = nn.sigmoid(nn.Conv(self.out_channels, (1,), name="conv2")(s))
        return s * x


class _SERes2Net(nn.Module):
    out_channels: int
    scale: int
    se_channels: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        if x.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1,), name="shortcut")(x)
        h = _BNTDNN(self.out_channels, 1, 1, name="tdnn1")(x, train)
        h = _Res2Net(self.out_channels, self.scale, self.kernel_size,
                     self.dilation, name="res2net")(h, train)
        h = _BNTDNN(self.out_channels, 1, 1, name="tdnn2")(h, train)
        return _SE(self.se_channels, self.out_channels, name="se")(h) + residual


class SpeakerEncoder(nn.Module):
    """mel [B, T, input_dim] → [B, embed_dim] speaker embedding."""

    cfg: SpeakerConfig = SpeakerConfig()

    @nn.compact
    def __call__(self, mel: jax.Array, train: bool = False) -> jax.Array:
        c = self.cfg
        feats = []
        h = _BNTDNN(c.channels[0], c.kernel_sizes[0], c.dilations[0],
                    name="block_0")(mel, train)
        feats.append(h)
        for i in range(1, len(c.channels) - 1):
            h = _SERes2Net(c.channels[i], c.res2net_scale, c.se_channels,
                           c.kernel_sizes[i], c.dilations[i],
                           name=f"block_{i}")(h, train)
            feats.append(h)
        h = jnp.concatenate(feats[1:], axis=-1)
        h = _BNTDNN(c.channels[-1], c.kernel_sizes[-1], c.dilations[-1],
                    name="mfa")(h, train)

        # attentive statistics pooling with global context
        B, T, C = h.shape
        mean = jnp.broadcast_to(h.mean(axis=1, keepdims=True), (B, T, C))
        std = jnp.broadcast_to(
            jnp.sqrt(jnp.clip(h.var(axis=1, keepdims=True), 1e-12)), (B, T, C)
        )
        attn = _BNTDNN(c.attention_channels, 1, 1, name="asp_tdnn")(
            jnp.concatenate([h, mean, std], axis=-1)
            if c.global_context else h,
            train,
        )
        attn = nn.Conv(C, (1,), name="asp_conv")(jnp.tanh(attn))
        w = jax.nn.softmax(attn, axis=1)
        p_mean = (w * h).sum(axis=1)
        p_std = jnp.sqrt(jnp.clip(
            (w * jnp.square(h - p_mean[:, None, :])).sum(axis=1), 1e-12))
        pooled = jnp.concatenate([p_mean, p_std], axis=-1)  # [B, 2C]

        pooled = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, name="asp_bn")(pooled)
        return nn.Dense(c.embed_dim, name="fc")(pooled)
