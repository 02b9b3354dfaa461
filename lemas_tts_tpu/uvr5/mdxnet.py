"""MDX-Net ``ConvTDFNet`` in flax (channel-last, XLA-friendly).

Re-implementation of the TFC-TDF U-Net used by UVR5 MDX models
(reference ``uvr5/lib_v5/mdxnet.py:34-124`` and ``uvr5/lib_v5/modules.py``):

  1×1 stem conv → n× [TFC_TDF → 2×2 strided conv] → bottleneck TFC_TDF →
  n× [2×2 transpose conv → ×skip → TFC_TDF] → 1×1 head conv

TFC = stack of 3×3 convs (+norm+ReLU); TDF = bottlenecked Linear over the
frequency axis, added residually. Skip connections are *multiplicative*
(``mdxnet.py:117``). Layout here is [B, T, F, C] (torch uses [B, C, T, F]);
the frequency Linear is an einsum over axis -2.

Norms: models trained with adamw use GroupNorm(2) (``mdxnet.py:52-55``);
rmsprop models use BatchNorm2d, which at inference is a fixed per-channel
affine — folded at conversion time into the ``affine`` norm mode.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class MDXConfig:
    """ConvTDFNet hyper-parameters. Defaults match the UVR Kim/Voc family
    (n_fft 7680, dim_f 3072, dim_t 2^8, 11 blocks, growth 32/48 varies)."""

    dim_c: int = 4
    dim_f: int = 3072
    dim_t: int = 256
    n_fft: int = 7680
    hop: int = 1024
    num_blocks: int = 11
    l: int = 3  # convs per TFC
    g: int = 48  # channel growth
    k: int = 3  # TFC kernel
    bn: int = 8  # TDF bottleneck factor (0 = single Linear)
    bias: bool = False
    norm: str = "group"  # "group" (adamw) | "affine" (folded BatchNorm)

    @property
    def n(self) -> int:
        return self.num_blocks // 2

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1


class Norm(nn.Module):
    """GroupNorm(2) or folded-BatchNorm per-channel affine."""

    mode: str  # "group" | "affine"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.mode == "group":
            return nn.GroupNorm(num_groups=2, epsilon=1e-5, name="gn")(x)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale + bias


class TFC(nn.Module):
    """l× (3×3 conv → norm → ReLU) (reference ``modules.py:5-22``)."""

    channels: int
    l: int
    k: int
    norm: str

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.l):
            x = nn.Conv(self.channels, (self.k, self.k),
                        padding=self.k // 2, name=f"conv_{i}")(x)
            x = nn.relu(Norm(self.norm, name=f"norm_{i}")(x))
        return x


class TDF(nn.Module):
    """Bottlenecked Linear over the frequency axis, per (t, c) position
    (reference ``modules.py:54-68``). x: [B, T, F, C]."""

    f: int
    bn: int
    bias: bool
    norm: str

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def lin(x, fout, name):
            w = self.param(f"{name}_w", nn.initializers.lecun_normal(),
                           (x.shape[-2], fout))
            y = jnp.einsum("btfc,fg->btgc", x, w)
            if self.bias:
                y = y + self.param(f"{name}_b", nn.initializers.zeros, (fout,))[
                    None, None, :, None
                ]
            return y

        if self.bn == 0:
            h = lin(x, self.f, "lin0")
            return nn.relu(Norm(self.norm, name="norm_0")(h))
        h = lin(x, self.f // self.bn, "lin0")
        h = nn.relu(Norm(self.norm, name="norm_0")(h))
        h = lin(h, self.f, "lin1")
        return nn.relu(Norm(self.norm, name="norm_1")(h))


class TFC_TDF(nn.Module):
    channels: int
    l: int
    f: int
    k: int
    bn: int
    bias: bool
    norm: str

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = TFC(self.channels, self.l, self.k, self.norm, name="tfc")(x)
        return x + TDF(self.f, self.bn, self.bias, self.norm, name="tdf")(x)


class ConvTDFNet(nn.Module):
    """[B, T, F, dim_c] packed spectrogram → same shape (target stem)."""

    cfg: MDXConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        h = nn.Conv(c.g, (1, 1), name="first_conv")(x)
        h = nn.relu(Norm(c.norm, name="first_norm")(h))

        f, ch = c.dim_f, c.g
        skips: List[jax.Array] = []
        for i in range(c.n):
            h = TFC_TDF(ch, c.l, f, c.k, c.bn, c.bias, c.norm, name=f"enc_{i}")(h)
            skips.append(h)
            h = nn.Conv(ch + c.g, (2, 2), strides=(2, 2), name=f"ds_conv_{i}")(h)
            h = nn.relu(Norm(c.norm, name=f"ds_norm_{i}")(h))
            f, ch = f // 2, ch + c.g

        h = TFC_TDF(ch, c.l, f, c.k, c.bn, c.bias, c.norm, name="bottleneck")(h)

        for i in range(c.n):
            h = nn.ConvTranspose(ch - c.g, (2, 2), strides=(2, 2),
                                 transpose_kernel=True, name=f"us_conv_{i}")(h)
            h = nn.relu(Norm(c.norm, name=f"us_norm_{i}")(h))
            f, ch = f * 2, ch - c.g
            h = h * skips[-i - 1]  # multiplicative skip (mdxnet.py:117)
            h = TFC_TDF(ch, c.l, f, c.k, c.bn, c.bias, c.norm, name=f"dec_{i}")(h)

        return nn.Conv(c.dim_c, (1, 1), name="final_conv")(h)


class Mixer(nn.Module):
    """Multi-stem blending head (reference ``mdxnet.py:126-140``): a bias-free
    Linear over the (stems+mix)×2 channel stack, applied per sample.
    [n_stems+1, 2, T] → [n_stems, 2, T]."""

    n_stems: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        T = x.shape[-1]
        h = x.reshape(1, (self.n_stems + 1) * 2, T).swapaxes(-1, -2)
        h = nn.Dense(self.n_stems * 2, use_bias=False, name="linear")(h)
        return h.swapaxes(-1, -2).reshape(self.n_stems, 2, T)


def convert_mixer(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """``mixer.ckpt`` (torch Linear) → flax params."""
    return {"linear": {"kernel": np.asarray(sd["linear.weight"]).T}}


# ----------------------------------------------------------------- conversion
def _conv2d(sd: Mapping[str, np.ndarray], p: str) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[f"{p}.weight"])  # torch [out, in, kh, kw]
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if f"{p}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{p}.bias"])
    return out


def _convT2d(sd: Mapping[str, np.ndarray], p: str) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[f"{p}.weight"])  # torch [in, out, kh, kw]
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}  # [kh, kw, out, in] w/ transpose_kernel
    if f"{p}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{p}.bias"])
    return out


def _norm(sd: Mapping[str, np.ndarray], p: str, mode: str) -> Dict[str, Any]:
    if mode == "group":
        return {"gn": {"scale": np.asarray(sd[f"{p}.weight"]),
                       "bias": np.asarray(sd[f"{p}.bias"])}}
    # fold BatchNorm running stats into an affine (inference-time identity)
    w, b = np.asarray(sd[f"{p}.weight"]), np.asarray(sd[f"{p}.bias"])
    mean = np.asarray(sd[f"{p}.running_mean"])
    var = np.asarray(sd[f"{p}.running_var"])
    inv = w / np.sqrt(var + 1e-5)
    return {"scale": inv, "bias": b - mean * inv}


def _tdf(sd, p, mode, bias) -> Dict[str, Any]:
    # torch Sequential: Linear(0), norm(1), ReLU(2)[, Linear(3), norm(4), ReLU(5)]
    out: Dict[str, Any] = {
        "lin0_w": np.asarray(sd[f"{p}.0.weight"]).T,
        "norm_0": _norm(sd, f"{p}.1", mode),
    }
    if bias:
        out["lin0_b"] = np.asarray(sd[f"{p}.0.bias"])
    if f"{p}.3.weight" in sd:
        out["lin1_w"] = np.asarray(sd[f"{p}.3.weight"]).T
        out["norm_1"] = _norm(sd, f"{p}.4", mode)
        if bias:
            out["lin1_b"] = np.asarray(sd[f"{p}.3.bias"])
    return out


def _tfc_tdf(sd, p, cfg: MDXConfig) -> Dict[str, Any]:
    tfc: Dict[str, Any] = {}
    for i in range(cfg.l):
        tfc[f"conv_{i}"] = _conv2d(sd, f"{p}.tfc.H.{i}.0")
        tfc[f"norm_{i}"] = _norm(sd, f"{p}.tfc.H.{i}.1", cfg.norm)
    return {"tfc": tfc, "tdf": _tdf(sd, f"{p}.tdf", cfg.norm, cfg.bias)}


def convert_convtdfnet(sd: Mapping[str, np.ndarray], cfg: MDXConfig) -> Dict[str, Any]:
    """Torch ``ConvTDFNet`` state dict (or same-named ONNX initializers) →
    flax params for :class:`ConvTDFNet`."""
    params: Dict[str, Any] = {
        "first_conv": _conv2d(sd, "first_conv.0"),
        "first_norm": _norm(sd, "first_conv.1", cfg.norm),
        "bottleneck": _tfc_tdf(sd, "bottleneck_block", cfg),
        "final_conv": _conv2d(sd, "final_conv.0"),
    }
    for i in range(cfg.n):
        params[f"enc_{i}"] = _tfc_tdf(sd, f"encoding_blocks.{i}", cfg)
        params[f"ds_conv_{i}"] = _conv2d(sd, f"ds.{i}.0")
        params[f"ds_norm_{i}"] = _norm(sd, f"ds.{i}.1", cfg.norm)
        params[f"us_conv_{i}"] = _convT2d(sd, f"us.{i}.0")
        params[f"us_norm_{i}"] = _norm(sd, f"us.{i}.1", cfg.norm)
        params[f"dec_{i}"] = _tfc_tdf(sd, f"decoding_blocks.{i}", cfg)
    return params


def infer_config_from_state_dict(
    sd: Mapping[str, np.ndarray], n_fft: int = 7680, hop: int = 1024,
    dim_t: int = 256, norm: str = "group",
) -> MDXConfig:
    """Derive (g, l, n, bn, bias, dim_f, dim_c) from tensor shapes so any
    MDX variant loads without a side-channel config."""
    first = np.asarray(sd["first_conv.0.weight"])  # [g, dim_c, 1, 1]
    g, dim_c = first.shape[0], first.shape[1]
    l = 0
    while f"encoding_blocks.0.tfc.H.{l}.0.weight" in sd:
        l += 1
    n = 0
    while f"encoding_blocks.{n}.tfc.H.0.0.weight" in sd:
        n += 1
    k = int(np.asarray(sd["encoding_blocks.0.tfc.H.0.0.weight"]).shape[-1])
    tdf0 = np.asarray(sd["encoding_blocks.0.tdf.0.weight"])  # [f/bn or f, f]
    dim_f = tdf0.shape[1]
    bn = 0 if tdf0.shape[0] == dim_f and "encoding_blocks.0.tdf.3.weight" not in sd \
        else dim_f // tdf0.shape[0]
    bias = "encoding_blocks.0.tdf.0.bias" in sd
    return MDXConfig(dim_c=dim_c, dim_f=dim_f, dim_t=dim_t, n_fft=n_fft,
                     hop=hop, num_blocks=2 * n + 1, l=l, g=g, k=k, bn=bn,
                     bias=bias, norm=norm)
