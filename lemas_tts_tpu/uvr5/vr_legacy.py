"""Legacy UVR5 VR-architecture network (CascadedASPPNet) in flax.

The arch behind most published VR-arch separation checkpoints (reference
``uvr5/lib_v5/vr_network/nets.py:99-165`` with the capacity table at
``nets.py:49-97`` and layer library ``layers.py:7-143``): a three-stage
cascade of ASPP U-Nets over a multi-band magnitude spectrogram — stage 1
processes the low/high halves with separate nets, stages 2/3 refine the full
band through 1×1 "bridge" convs — emitting a sigmoid magnitude mask.

Model capacity comes in three families selected by ``nn_architecture`` (an
upstream convention: the checkpoint file size in KiB): "sp" {31191, 33966,
129605}, "hp" {123821, 123812}, "hp2" {537238, 537227}. Architecture 129605
adds a 5th encoder stage and a 6-branch ASPP; 537238/537227/33966 use a
7-branch ASPP whose two extra branches SHARE one weight set (a quirk of the
reference constructor, ``layers.py:103-110`` — ``conv6``/``conv7`` are the
same module object, so checkpoints carry identical tensors under both names).

TPU notes: channel-last ``[B, F, T, C]`` layout throughout; shares
``ConvBNActiv`` / bilinear-2x / crop helpers with the new-arch module
(``vr_network.py``); BatchNorms run on stored running stats (inference
framework). Hyper-parameters are recovered from checkpoint weight *shapes*
(robust), with the upstream file-size rule as a fallback.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lemas_tts_tpu.uvr5.vr_network import (
    ConvBNActiv,
    bilinear_2x_align_corners,
    crop_center,
)

SP_ARCHS = (31191, 33966, 129605)
HP_ARCHS = (123821, 123812)
HP2_ARCHS = (537238, 537227)
SIX_LAYER = (129605,)
SEVEN_LAYER = (537238, 537227, 33966)
NN_ARCH_SIZES = sorted(SP_ARCHS + HP_ARCHS + HP2_ARCHS)


class SeperableConvBNActiv(nn.Module):
    """Depthwise 3×3 dilated + pointwise 1×1 + BN + activ
    (reference ``layers.py:26-46``; the upstream spelling is kept)."""

    nin: int
    nout: int
    ksize: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.nin, (self.ksize, self.ksize),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=self.pad, feature_group_count=self.nin,
                    use_bias=False, name="depthwise")(x)
        x = nn.Conv(self.nout, (1, 1), use_bias=False, name="pointwise")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn")(x)
        return nn.relu(x)


class EncoderLegacy(nn.Module):
    """conv1 (stride 1) → skip, conv2 (stride 2) → down; LeakyReLU
    (reference ``layers.py:50-62`` — note the skip is conv1's output, the
    opposite of the new-arch Encoder)."""

    nout: int
    stride: int = 2

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        skip = ConvBNActiv(self.nout, 3, 1, 1, activ="leaky", name="conv1")(x)
        h = ConvBNActiv(self.nout, 3, self.stride, 1, activ="leaky",
                        name="conv2")(skip)
        return h, skip


class DecoderLegacy(nn.Module):
    """bilinear 2× (align_corners) → concat cropped skip → conv; ReLU
    (reference ``layers.py:65-83``; dropout branch unused at inference)."""

    nout: int

    @nn.compact
    def __call__(self, x, skip=None):
        x = bilinear_2x_align_corners(x)
        if skip is not None:
            x = x[:, : skip.shape[1], : skip.shape[2], :]
            x = jnp.concatenate([x, crop_center(skip, x)], axis=-1)
        return ConvBNActiv(self.nout, 3, 1, 1, name="conv")(x)


class ASPPModuleLegacy(nn.Module):
    """Legacy ASPP: freq-pooled context + 1×1 + 3 (or 4/5) dilated separable
    branches → 1×1 bottleneck (reference ``layers.py:86-143``). ``n_branches``
    is 5/6/7 per the arch family; branches ≥ 6 share weights in reference
    checkpoints (converted as duplicates — numerics identical)."""

    nout: int
    dilations: Tuple[int, ...] = (4, 8, 16)
    n_branches: int = 5

    @nn.compact
    def __call__(self, x):
        B, F_, T, C = x.shape
        g = x.mean(axis=1, keepdims=True)  # AdaptiveAvgPool2d((1, None))
        g = ConvBNActiv(C, 1, 1, 0, name="conv1")(g)
        feats = [jnp.broadcast_to(g, (B, F_, T, C)),
                 ConvBNActiv(C, 1, 1, 0, name="conv2")(x)]
        for i in range(3, self.n_branches + 1):
            d = self.dilations[min(i - 3, len(self.dilations) - 1)]
            feats.append(SeperableConvBNActiv(C, C, 3, 1, d, d,
                                              name=f"conv{i}")(x))
        out = jnp.concatenate(feats, axis=-1)
        return ConvBNActiv(self.nout, 1, 1, 0, name="bottleneck")(out)


class BaseASPPNet(nn.Module):
    """4(+1)-level encoder / ASPP / decoder U-Net
    (reference ``nets.py:7-47``)."""

    ch: int
    five_stage: bool = False  # nn_architecture 129605
    n_aspp_branches: int = 5
    dilations: Tuple[int, ...] = (4, 8, 16)

    @nn.compact
    def __call__(self, x):
        ch = self.ch
        h, e1 = EncoderLegacy(ch, name="enc1")(x)
        h, e2 = EncoderLegacy(ch * 2, name="enc2")(h)
        h, e3 = EncoderLegacy(ch * 4, name="enc3")(h)
        h, e4 = EncoderLegacy(ch * 8, name="enc4")(h)
        if self.five_stage:
            h, e5 = EncoderLegacy(ch * 16, name="enc5")(h)
            h = ASPPModuleLegacy(ch * 32, self.dilations,
                                 self.n_aspp_branches, name="aspp")(h)
            h = DecoderLegacy(ch * 16, name="dec5")(h, e5)
        else:
            h = ASPPModuleLegacy(ch * 16, self.dilations,
                                 self.n_aspp_branches, name="aspp")(h)
        h = DecoderLegacy(ch * 8, name="dec4")(h, e4)
        h = DecoderLegacy(ch * 4, name="dec3")(h, e3)
        h = DecoderLegacy(ch * 2, name="dec2")(h, e2)
        return DecoderLegacy(ch, name="dec1")(h, e1)


def _capacity(nn_architecture: int) -> dict:
    """Channel widths per family (reference ``determine_model_capacity``
    table, ``nets.py:49-97``, reduced to its two degrees of freedom)."""
    if nn_architecture in SP_ARCHS:
        ch = 16
    elif nn_architecture in HP_ARCHS:
        ch = 32
    elif nn_architecture in HP2_ARCHS:
        ch = 64
    else:
        raise ValueError(f"unknown nn_architecture {nn_architecture}")
    if nn_architecture in SIX_LAYER:
        branches = 6
    elif nn_architecture in SEVEN_LAYER:
        branches = 7
    else:
        branches = 5
    return {"ch": ch, "bridge2": ch // 2, "stg2_ch": ch,
            "bridge3": ch, "stg3_ch": ch * 2, "n_branches": branches,
            "five_stage": nn_architecture in SIX_LAYER}


class CascadedASPPNet(nn.Module):
    """[B, 2, bins, T] magnitude → sigmoid mask [B, 2, n_fft//2+1, T]
    (reference ``nets.py:99-165``; inference path — the aux heads are
    training-only and dropped)."""

    n_fft: int
    nn_architecture: int = 123821

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cap = _capacity(self.nn_architecture)
        max_bin = self.n_fft // 2
        output_bin = self.n_fft // 2 + 1
        x = jnp.transpose(x[:, :, :max_bin, :], (0, 2, 3, 1))  # [B, F, T, 2]

        bandw = x.shape[1] // 2
        kw = dict(five_stage=cap["five_stage"],
                  n_aspp_branches=cap["n_branches"])
        aux1 = jnp.concatenate(
            [BaseASPPNet(cap["ch"], name="stg1_low", **kw)(x[:, :bandw]),
             BaseASPPNet(cap["ch"], name="stg1_high", **kw)(x[:, bandw:])],
            axis=1,
        )

        h = jnp.concatenate([x, aux1], axis=-1)
        h = ConvBNActiv(cap["bridge2"], 1, 1, 0, name="stg2_bridge")(h)
        aux2 = BaseASPPNet(cap["stg2_ch"], name="stg2_full", **kw)(h)

        h = jnp.concatenate([x, aux1, aux2], axis=-1)
        h = ConvBNActiv(cap["bridge3"], 1, 1, 0, name="stg3_bridge")(h)
        h = BaseASPPNet(cap["stg3_ch"], name="stg3_full", **kw)(h)

        mask = nn.sigmoid(nn.Conv(2, (1, 1), use_bias=False, name="out")(h))
        mask = jnp.transpose(mask, (0, 3, 1, 2))  # [B, 2, F, T]
        pad = output_bin - mask.shape[2]
        return jnp.concatenate(
            [mask, jnp.repeat(mask[:, :, -1:, :], pad, axis=2)], axis=2
        )


# ------------------------------------------------------------- conversion

def _cv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _conv_bn(sd, prefix: str):
    """Reference ``Conv2DBNActiv`` → ConvBNActiv params/stats."""
    p = {"conv": {"kernel": _cv(sd[f"{prefix}.conv.0.weight"])},
         "bn": {"scale": sd[f"{prefix}.conv.1.weight"],
                "bias": sd[f"{prefix}.conv.1.bias"]}}
    s = {"bn": {"mean": sd[f"{prefix}.conv.1.running_mean"],
                "var": sd[f"{prefix}.conv.1.running_var"]}}
    return p, s


def _sep_conv_bn(sd, prefix: str):
    """Reference ``SeperableConv2DBNActiv`` (conv.0 depthwise / conv.1
    pointwise / conv.2 BN)."""
    p = {"depthwise": {"kernel": _cv(sd[f"{prefix}.conv.0.weight"])},
         "pointwise": {"kernel": _cv(sd[f"{prefix}.conv.1.weight"])},
         "bn": {"scale": sd[f"{prefix}.conv.2.weight"],
                "bias": sd[f"{prefix}.conv.2.bias"]}}
    s = {"bn": {"mean": sd[f"{prefix}.conv.2.running_mean"],
                "var": sd[f"{prefix}.conv.2.running_var"]}}
    return p, s


def _encoder(sd, prefix: str):
    p, s = {}, {}
    for c in ("conv1", "conv2"):
        p[c], s[c] = _conv_bn(sd, f"{prefix}.{c}")
    return p, s


def _decoder(sd, prefix: str):
    p, s = {}, {}
    p["conv"], s["conv"] = _conv_bn(sd, f"{prefix}.conv")
    return p, s


def _aspp(sd, prefix: str, n_branches: int):
    p, s = {}, {}
    p["conv1"], s["conv1"] = _conv_bn(sd, f"{prefix}.conv1.1")
    p["conv2"], s["conv2"] = _conv_bn(sd, f"{prefix}.conv2")
    for i in range(3, n_branches + 1):
        p[f"conv{i}"], s[f"conv{i}"] = _sep_conv_bn(sd, f"{prefix}.conv{i}")
    p["bottleneck"], s["bottleneck"] = _conv_bn(sd, f"{prefix}.bottleneck.0")
    return p, s


def _base_aspp_net(sd, prefix: str, five_stage: bool, n_branches: int):
    p, s = {}, {}
    encs = ("enc1", "enc2", "enc3", "enc4") + (("enc5",) if five_stage else ())
    decs = (("dec5",) if five_stage else ()) + ("dec4", "dec3", "dec2", "dec1")
    for e in encs:
        p[e], s[e] = _encoder(sd, f"{prefix}.{e}")
    p["aspp"], s["aspp"] = _aspp(sd, f"{prefix}.aspp", n_branches)
    for d in decs:
        p[d], s[d] = _decoder(sd, f"{prefix}.{d}")
    return p, s


def infer_architecture(sd) -> int:
    """Recover ``nn_architecture`` from checkpoint weight shapes: the stage-1
    channel width selects the family, enc5/conv7 presence the variant —
    replaces the upstream convention of matching the checkpoint's file size
    in KiB against ``NN_ARCH_SIZES``."""
    ch = sd["stg1_low_band_net.enc1.conv1.conv.0.weight"].shape[0]
    has_enc5 = any(".enc5." in k for k in sd)
    has_conv7 = any(".aspp.conv7." in k for k in sd)
    if ch == 16:
        if has_enc5:
            return 129605
        return 33966 if has_conv7 else 31191
    if ch == 32:
        return 123821
    if ch == 64:
        return 537238
    raise ValueError(f"unrecognized VR-arch capacity: stage-1 ch={ch}")


def convert_cascaded_aspp(sd):
    """Legacy VR-arch torch state dict → (flax variables, nn_architecture).
    n_fft is not stored in the checkpoint — callers pass it from the band
    params (``n_fft = 2·bins``)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    arch = infer_architecture(sd)
    cap = _capacity(arch)
    p, s = {}, {}
    for ours, theirs in (("stg1_low", "stg1_low_band_net"),
                         ("stg1_high", "stg1_high_band_net"),
                         ("stg2_full", "stg2_full_band_net"),
                         ("stg3_full", "stg3_full_band_net")):
        p[ours], s[ours] = _base_aspp_net(
            sd, theirs, cap["five_stage"], cap["n_branches"])
    p["stg2_bridge"], s["stg2_bridge"] = _conv_bn(sd, "stg2_bridge")
    p["stg3_bridge"], s["stg3_bridge"] = _conv_bn(sd, "stg3_bridge")
    p["out"] = {"kernel": _cv(sd["out.weight"])}  # aux heads are train-only
    variables = jax.tree_util.tree_map(
        jnp.asarray, {"params": p, "batch_stats": s}
    )
    return variables, arch


def is_legacy_state_dict(sd) -> bool:
    """Legacy CascadedASPPNet vs new CascadedNet key shapes: the new arch
    nests its band nets in Sequentials (``stg1_low_band_net.0.…``)."""
    return any(k.startswith("stg1_low_band_net.enc1.") for k in sd)
