"""Pretssel prosody encoder: ECAPA-TDNN in flax.

Re-design of the reference's self-contained ECAPA-TDNN
(``lemas_tts/model/backbones/prosody_encoder.py:30-433``) producing an
L2-normalized utterance-level prosody embedding from 80-dim kaldi FBANK
features @16 kHz. Channel-last layout throughout (XLA-friendly: the 1-D convs
lower to MXU matmuls over [B, T, C]); torch's channel-first transposes are
gone.

Structure (matching the reference exactly so weights convert 1:1):
  TDNN stem → (n−2) × SE-Res2Net blocks → multi-layer-feature concat →
  MFA TDNN → attentive statistics pooling (+global context) → LN →
  1×1 conv to embed_dim → L2 normalize.
"""

from __future__ import annotations

import json
import warnings
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lemas_tts_tpu.ops.fbank import extract_fbank_16k

LN_EPS = 1e-12


@dataclass(frozen=True)
class ECAPAConfig:
    """Pretssel prosody-encoder hyper-parameters (cfg JSON ``model`` keys,
    reference ``prosody_encoder.py:383-403``)."""

    channels: Tuple[int, ...] = (512, 512, 512, 512, 1536)
    kernel_sizes: Tuple[int, ...] = (5, 3, 3, 3, 1)
    dilations: Tuple[int, ...] = (1, 2, 3, 4, 1)
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    global_context: bool = True
    groups: Tuple[int, ...] = (1, 1, 1, 1, 1)
    embed_dim: int = 512
    input_dim: int = 80

    @classmethod
    def from_pretssel_json(cls, cfg_path) -> "ECAPAConfig":
        cfg = json.loads(Path(cfg_path).read_text())
        m = cfg["model"]
        return cls(
            channels=tuple(m["prosody_channels"]),
            kernel_sizes=tuple(m["prosody_kernel_sizes"]),
            dilations=tuple(m["prosody_dilations"]),
            attention_channels=m["prosody_attention_channels"],
            res2net_scale=m["prosody_res2net_scale"],
            se_channels=m["prosody_se_channels"],
            global_context=m["prosody_global_context"],
            groups=tuple(m["prosody_groups"]),
            embed_dim=m["prosody_embed_dim"],
            input_dim=m["input_feat_per_channel"],
        )


class TDNNBlock(nn.Module):
    """conv1d → ReLU → LayerNorm(C) (reference ``TDNNBlock``, ``:135-158``)."""

    out_channels: int
    kernel_size: int
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, C]
        pad = self.dilation * (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            padding=[(pad, pad)],
            name="conv",
        )(x)
        x = nn.relu(x)
        return nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)


class Res2NetBlock(nn.Module):
    """Hierarchical multi-scale conv (reference ``Res2NetBlock``, ``:161-199``):
    split channels into ``scale`` groups; group 0 passes through, each later
    group goes through a TDNN over (x_i + y_{i-1})."""

    out_channels: int
    scale: int = 8
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = self.out_channels // self.scale
        chunks = jnp.split(x, self.scale, axis=-1)
        ys: List[jax.Array] = []
        y = None
        for i, x_i in enumerate(chunks):
            if i == 0:
                y = x_i
            elif i == 1:
                y = TDNNBlock(hidden, self.kernel_size, self.dilation,
                              name=f"block_{i - 1}")(x_i)
            else:
                y = TDNNBlock(hidden, self.kernel_size, self.dilation,
                              name=f"block_{i - 1}")(x_i + y)
            ys.append(y)
        return jnp.concatenate(ys, axis=-1)


class SEBlock(nn.Module):
    """Squeeze-and-excitation over time (reference ``SEBlock``, ``:202-226``)."""

    se_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array, frame_mask: Optional[jax.Array] = None):
        if frame_mask is not None:
            m = frame_mask[..., None].astype(x.dtype)  # [B, T, 1]
            s = (x * m).sum(axis=1, keepdims=True) / jnp.clip(
                m.sum(axis=1, keepdims=True), 1.0
            )
        else:
            s = x.mean(axis=1, keepdims=True)
        s = nn.relu(nn.Conv(self.se_channels, (1,), name="conv1")(s))
        s = nn.sigmoid(nn.Conv(self.out_channels, (1,), name="conv2")(s))
        return s * x


class AttentiveStatisticsPooling(nn.Module):
    """Attention-weighted mean+std pooling with optional global context
    (reference ``AttentiveStatisticsPooling``, ``:229-278``). [B,T,C]→[B,1,2C]."""

    channels: int
    attention_channels: int = 128
    global_context: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, frame_mask: Optional[jax.Array] = None):
        B, T, C = x.shape
        if frame_mask is None:
            mask = jnp.ones((B, T), x.dtype)
        else:
            mask = frame_mask.astype(x.dtype)
        m = mask[..., None]  # [B, T, 1]

        def stats(x, w):
            mean = (w * x).sum(axis=1)  # [B, C]
            var = (w * jnp.square(x - mean[:, None, :])).sum(axis=1)
            return mean, jnp.sqrt(jnp.clip(var, LN_EPS))

        if self.global_context:
            # clamp like SEBlock: a fully-masked (dummy) row must not 0/0-NaN
            total = jnp.clip(m.sum(axis=1, keepdims=True), 1.0)
            mean, std = stats(x, m / total)
            attn_in = jnp.concatenate(
                [x,
                 jnp.broadcast_to(mean[:, None, :], (B, T, C)),
                 jnp.broadcast_to(std[:, None, :], (B, T, C))],
                axis=-1,
            )
        else:
            attn_in = x

        attn = TDNNBlock(self.attention_channels, 1, 1, name="tdnn")(attn_in)
        attn = nn.Conv(self.channels, (1,), name="conv")(jnp.tanh(attn))
        # finite mask value: -inf on a fully-masked row makes the softmax NaN
        attn = jnp.where(m == 0, -1e30, attn)
        attn = jax.nn.softmax(attn, axis=1)
        mean, std = stats(x, attn)
        return jnp.concatenate([mean, std], axis=-1)[:, None, :]  # [B, 1, 2C]


class SERes2NetBlock(nn.Module):
    """1×1 TDNN → Res2Net → 1×1 TDNN → SE, with residual shortcut
    (reference ``SERes2NetBlock``, ``:281-334``)."""

    out_channels: int
    res2net_scale: int = 8
    se_channels: int = 128
    kernel_size: int = 1
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, frame_mask: Optional[jax.Array] = None):
        residual = x
        if x.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1,), name="shortcut")(x)
        h = TDNNBlock(self.out_channels, 1, 1, self.groups, name="tdnn1")(x)
        h = Res2NetBlock(self.out_channels, self.res2net_scale,
                         self.kernel_size, self.dilation, name="res2net")(h)
        h = TDNNBlock(self.out_channels, 1, 1, self.groups, name="tdnn2")(h)
        h = SEBlock(self.se_channels, self.out_channels, name="se")(h, frame_mask)
        return h + residual


class ECAPA_TDNN(nn.Module):
    """[B, T, input_dim] fbank → [B, embed_dim] L2-normalized embedding
    (reference ``ECAPA_TDNN``, ``:30-132``)."""

    cfg: ECAPAConfig

    @nn.compact
    def __call__(self, x: jax.Array, frame_mask: Optional[jax.Array] = None):
        c = self.cfg
        feats: List[jax.Array] = []
        h = TDNNBlock(c.channels[0], c.kernel_sizes[0], c.dilations[0],
                      c.groups[0], name="block_0")(x)
        feats.append(h)
        for i in range(1, len(c.channels) - 1):
            h = SERes2NetBlock(
                c.channels[i],
                res2net_scale=c.res2net_scale,
                se_channels=c.se_channels,
                kernel_size=c.kernel_sizes[i],
                dilation=c.dilations[i],
                groups=c.groups[i],
                name=f"block_{i}",
            )(h, frame_mask)
            feats.append(h)

        # multi-layer feature aggregation: concat all SE-Res2Net outputs
        h = jnp.concatenate(feats[1:], axis=-1)
        h = TDNNBlock(c.channels[-1], c.kernel_sizes[-1], c.dilations[-1],
                      c.groups[-1], name="mfa")(h)

        h = AttentiveStatisticsPooling(
            c.channels[-1], c.attention_channels, c.global_context, name="asp"
        )(h, frame_mask)
        h = nn.LayerNorm(epsilon=LN_EPS, name="asp_norm")(h)
        h = nn.Conv(c.embed_dim, (1,), name="fc")(h)[:, 0, :]  # [B, embed]
        return h / jnp.clip(
            jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12
        )  # F.normalize semantics


# --------------------------------------------------------------- conversion
def _conv(sd: Mapping[str, np.ndarray], p: str) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[f"{p}.weight"])  # torch [out, in/g, k]
    out = {"kernel": np.transpose(w, (2, 1, 0))}
    if f"{p}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{p}.bias"])
    return out


def _ln(sd, p):
    return {"scale": np.asarray(sd[f"{p}.weight"]), "bias": np.asarray(sd[f"{p}.bias"])}


def _tdnn(sd, p):
    return {"conv": _conv(sd, f"{p}.conv"), "norm": _ln(sd, f"{p}.norm")}


def convert_prosody_encoder(
    sd: Mapping[str, np.ndarray], cfg: ECAPAConfig
) -> Dict[str, Any]:
    """Reference prosody-encoder state dict (after the key-prefix remap of
    ``prosody_encoder.py:405-423``) → flax params for :class:`ECAPA_TDNN`."""
    params: Dict[str, Any] = {"block_0": _tdnn(sd, "blocks.0")}
    n = len(cfg.channels)
    for i in range(1, n - 1):
        b = f"blocks.{i}"
        blk: Dict[str, Any] = {
            "tdnn1": _tdnn(sd, f"{b}.tdnn1"),
            "tdnn2": _tdnn(sd, f"{b}.tdnn2"),
            "se": {"conv1": _conv(sd, f"{b}.se_block.conv1"),
                   "conv2": _conv(sd, f"{b}.se_block.conv2")},
            "res2net": {
                f"block_{j}": _tdnn(sd, f"{b}.res2net_block.blocks.{j}")
                for j in range(cfg.res2net_scale - 1)
            },
        }
        if f"{b}.shortcut.weight" in sd:
            blk["shortcut"] = _conv(sd, f"{b}.shortcut")
        params[f"block_{i}"] = blk
    params["mfa"] = _tdnn(sd, "mfa")
    params["asp"] = {"tdnn": _tdnn(sd, "asp.tdnn"), "conv": _conv(sd, "asp.conv")}
    params["asp_norm"] = _ln(sd, "asp_norm")
    params["fc"] = _conv(sd, "fc")
    return params


def remap_prosody_state_dict(sd: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Strip ``prosody_encoder.``/``prosody_encoder_model.`` prefixes
    (reference ``:405-423``)."""
    prefixes = ("prosody_encoder_model.", "prosody_encoder.")
    if any(k.startswith(p) for k in sd for p in prefixes):
        out = {}
        for k, v in sd.items():
            for p in prefixes:
                if k.startswith(p):
                    out[k[len(p):]] = v
                    break
        return out
    return dict(sd)


# ------------------------------------------------------------------ wrapper
class ProsodyEncoder:
    """Frozen prosody encoder: raw 16 kHz audio → [512] embedding.

    TPU-side inference is one jitted apply; fbank extraction is a jittable
    XLA graph (``ops/fbank.py``). Mirrors the reference wrapper surface
    (``prosody_encoder.py:364-433``)."""

    def __init__(self, cfg: ECAPAConfig, params: Any):
        self.cfg = cfg
        self.model = ECAPA_TDNN(cfg=cfg)
        self.params = params
        self._apply = jax.jit(self.model.apply)

    @classmethod
    def build(cls, cfg_path: str = "", ckpt_path: str = "",
              allow_random: bool = True) -> "ProsodyEncoder":
        cfg = (
            ECAPAConfig.from_pretssel_json(cfg_path)
            if cfg_path and Path(cfg_path).is_file()
            else ECAPAConfig()
        )
        model = ECAPA_TDNN(cfg=cfg)
        if ckpt_path and Path(ckpt_path).is_file():
            from lemas_tts_tpu.infer.checkpoints import load_state_dict

            sd = remap_prosody_state_dict(load_state_dict(ckpt_path))
            params = {"params": convert_prosody_encoder(sd, cfg)}
        elif allow_random:
            warnings.warn(f"no prosody ckpt at {ckpt_path!r} — random init")
            params = model.init(
                jax.random.key(0), jnp.zeros((1, 16, cfg.input_dim))
            )
        else:
            raise FileNotFoundError(ckpt_path)
        return cls(cfg, params)

    def __call__(self, fbank: jax.Array, frame_mask=None) -> jax.Array:
        """[B, T, 80] fbank → [B, embed_dim]."""
        return self._apply(self.params, fbank, frame_mask)

    def embed(self, audio_16k: np.ndarray) -> np.ndarray:
        """Raw 16 kHz mono audio → [embed_dim] numpy embedding
        (the per-sample path of ``cfm.py:248-265``)."""
        fbank = extract_fbank_16k(audio_16k)
        return np.asarray(self(jnp.asarray(fbank)[None]))[0]
