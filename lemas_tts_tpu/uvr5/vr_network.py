"""UVR5 VR-architecture separation network (CascadedNet) in flax.

Alternate separation family reachable via ``process_method='VR Arc'``
(reference ``uvr5/lib_v5/vr_network/nets_new.py:41-125`` + ``layers_new.py``):
a dual-band cascade of U-Nets — stage 1 processes low/high spectrogram bands
separately, stage 2 refines with stage-1 features, stage 3 fuses the full
band — each U-Net an encoder/ASPP/decoder with a bidirectional-LSTM bottleneck
branch; output is a sigmoid magnitude mask.

TPU notes: channel-last [B, F, T, C] layout; bilinear ``align_corners=True``
upsampling implemented explicitly (XLA's resize has no align_corners mode);
the BiLSTM runs as a ``flax`` ``nn.RNN`` scan over time. BatchNorms run in
inference mode (running stats) — this is an inference framework component.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def bilinear_2x_align_corners(x: jax.Array) -> jax.Array:
    """[B, H, W, C] → [B, 2H, 2W, C], matching torch
    ``F.interpolate(scale_factor=2, mode='bilinear', align_corners=True)``."""
    B, H, W, C = x.shape

    def axis_resize(arr, out_len, axis):
        in_len = arr.shape[axis]
        if in_len == 1:
            return jnp.repeat(arr, out_len, axis=axis)
        pos = jnp.arange(out_len) * (in_len - 1) / (out_len - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_len - 1)
        w = (pos - lo).astype(arr.dtype)
        a = jnp.take(arr, lo, axis=axis)
        b = jnp.take(arr, hi, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = out_len
        return a + (b - a) * w.reshape(shape)

    x = axis_resize(x, 2 * H, 1)
    return axis_resize(x, 2 * W, 2)


def crop_center(skip: jax.Array, target: jax.Array) -> jax.Array:
    """Center-crop ``skip`` [B, F, T, C] to ``target``'s F/T
    (reference ``spec_utils.crop_center``; requires skip ≥ target)."""
    dF = skip.shape[1] - target.shape[1]
    dT = skip.shape[2] - target.shape[2]
    assert dF >= 0 and dT >= 0, (skip.shape, target.shape)
    f0, t0 = dF // 2, dT // 2
    return skip[:, f0 : f0 + target.shape[1], t0 : t0 + target.shape[2], :]


class ConvBNActiv(nn.Module):
    nout: int
    ksize: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    activ: str = "relu"  # "relu" | "leaky"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.nout, (self.ksize, self.ksize),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=self.pad, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn")(x)
        return nn.relu(x) if self.activ == "relu" else nn.leaky_relu(x, 0.01)


class Encoder(nn.Module):
    nout: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        h = ConvBNActiv(self.nout, 3, self.stride, 1, activ="leaky",
                        name="conv1")(x)
        return ConvBNActiv(self.nout, 3, 1, 1, activ="leaky", name="conv2")(h)


class Decoder(nn.Module):
    nout: int

    @nn.compact
    def __call__(self, x, skip=None):
        x = bilinear_2x_align_corners(x)
        if skip is not None:
            # upsampling can overshoot an odd-sized skip by one — trim x first
            x = x[:, : skip.shape[1], : skip.shape[2], :]
            x = jnp.concatenate([x, crop_center(skip, x)], axis=-1)
        return ConvBNActiv(self.nout, 3, 1, 1, name="conv1")(x)


class ASPPModule(nn.Module):
    nout: int
    dilations: Tuple[Tuple[int, int], ...] = ((4, 2), (8, 4), (12, 6))

    @nn.compact
    def __call__(self, x):
        B, F_, T, C = x.shape
        # global (freq-pooled) context branch, resized back
        g = x.mean(axis=1, keepdims=True)
        g = ConvBNActiv(self.nout, 1, 1, 0, name="conv1")(g)
        g = jnp.broadcast_to(g, (B, F_, T, self.nout))
        feats = [g, ConvBNActiv(self.nout, 1, 1, 0, name="conv2")(x)]
        for i, d in enumerate(self.dilations):
            df, dt = d if isinstance(d, (tuple, list)) else (d, d)
            h = nn.Conv(self.nout, (3, 3), kernel_dilation=(df, dt),
                        padding=[(df, df), (dt, dt)], use_bias=False,
                        name=f"conv{i + 3}_conv")(x)
            h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             name=f"conv{i + 3}_bn")(h)
            feats.append(nn.relu(h))
        out = jnp.concatenate(feats, axis=-1)
        return ConvBNActiv(self.nout, 1, 1, 0, name="bottleneck")(out)


class LSTMModule(nn.Module):
    """conv → BiLSTM over time → dense, returned as one extra channel
    (reference ``layers_new.py:102-126``)."""

    nin_lstm: int
    nout_lstm: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, F, T, C]
        B, F_, T, C = x.shape
        h = ConvBNActiv(1, 1, 1, 0, name="conv")(x)[..., 0]  # [B, F, T]
        h = jnp.swapaxes(h, 1, 2)  # [B, T, F]
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.nout_lstm // 2), name="lstm_fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.nout_lstm // 2), reverse=True,
                     keep_order=True, name="lstm_bwd")
        h = jnp.concatenate([fwd(h), bwd(h)], axis=-1)  # [B, T, nout]
        h = nn.Dense(self.nin_lstm, name="dense")(h)
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="dense_bn")(h)
        h = nn.relu(h)  # [B, T, F]
        return jnp.swapaxes(h, 1, 2)[..., None]  # [B, F, T, 1]


class BaseNet(nn.Module):
    """One U-Net stage (reference ``nets_new.py:6-39``)."""

    nout: int
    nin_lstm: int
    nout_lstm: int
    dilations: Tuple[Tuple[int, int], ...] = ((4, 2), (8, 4), (12, 6))

    @nn.compact
    def __call__(self, x):
        e1 = ConvBNActiv(self.nout, 3, 1, 1, name="enc1")(x)
        e2 = Encoder(self.nout * 2, name="enc2")(e1)
        e3 = Encoder(self.nout * 4, name="enc3")(e2)
        e4 = Encoder(self.nout * 6, name="enc4")(e3)
        e5 = Encoder(self.nout * 8, name="enc5")(e4)
        h = ASPPModule(self.nout * 8, self.dilations, name="aspp")(e5)
        h = Decoder(self.nout * 6, name="dec4")(h, e4)
        h = Decoder(self.nout * 4, name="dec3")(h, e3)
        h = Decoder(self.nout * 2, name="dec2")(h, e2)
        h = jnp.concatenate(
            [h, LSTMModule(self.nin_lstm, self.nout_lstm, name="lstm_dec2")(h)],
            axis=-1,
        )
        return Decoder(self.nout, name="dec1")(h, e1)


class CascadedNet(nn.Module):
    """[B, 2, n_bins, T] complex-as-channels magnitude in → sigmoid mask
    (reference ``nets_new.py:41-125``). Input layout converted internally to
    channel-last."""

    n_fft: int
    nout: int = 32
    nout_lstm: int = 128

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        max_bin = self.n_fft // 2
        output_bin = self.n_fft // 2 + 1
        nin_lstm = max_bin // 2
        x = jnp.transpose(x[:, :, :max_bin, :], (0, 2, 3, 1))  # [B, F, T, 2]

        bandw = x.shape[1] // 2
        l1_in, h1_in = x[:, :bandw], x[:, bandw:]
        l1 = BaseNet(self.nout // 2, nin_lstm // 2, self.nout_lstm,
                     name="stg1_low")(l1_in)
        l1 = ConvBNActiv(self.nout // 4, 1, 1, 0, name="stg1_low_out")(l1)
        h1 = BaseNet(self.nout // 4, nin_lstm // 2, self.nout_lstm // 2,
                     name="stg1_high")(h1_in)
        aux1 = jnp.concatenate([l1, h1], axis=1)

        l2 = BaseNet(self.nout, nin_lstm // 2, self.nout_lstm, name="stg2_low")(
            jnp.concatenate([l1_in, l1], axis=-1)
        )
        l2 = ConvBNActiv(self.nout // 2, 1, 1, 0, name="stg2_low_out")(l2)
        h2 = BaseNet(self.nout // 2, nin_lstm // 2, self.nout_lstm // 2,
                     name="stg2_high")(jnp.concatenate([h1_in, h1], axis=-1))
        aux2 = jnp.concatenate([l2, h2], axis=1)

        f3 = BaseNet(self.nout, nin_lstm, self.nout_lstm, name="stg3_full")(
            jnp.concatenate([x, aux1, aux2], axis=-1)
        )
        mask = nn.sigmoid(
            nn.Conv(2, (1, 1), use_bias=False, name="out")(f3)
        )  # [B, F, T, 2]
        mask = jnp.transpose(mask, (0, 3, 1, 2))  # [B, 2, F, T]
        # replicate-pad the cropped top bins back (nets_new.py:92-96)
        pad = output_bin - mask.shape[2]
        return jnp.concatenate(
            [mask, jnp.repeat(mask[:, :, -1:, :], pad, axis=2)], axis=2
        )


# --------------------------------------------------------------- conversion
def _cv(w: np.ndarray) -> np.ndarray:
    """torch Conv2d kernel [O, I, kh, kw] → flax [kh, kw, I, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def _conv_bn(sd, prefix: str):
    """Reference ``Conv2DBNActiv`` (``layers_new.py:7-24``: Sequential of
    Conv2d/BatchNorm2d/activ) → our ``ConvBNActiv`` params + batch stats."""
    p = {"conv": {"kernel": _cv(sd[f"{prefix}.conv.0.weight"])},
         "bn": {"scale": sd[f"{prefix}.conv.1.weight"],
                "bias": sd[f"{prefix}.conv.1.bias"]}}
    s = {"bn": {"mean": sd[f"{prefix}.conv.1.running_mean"],
                "var": sd[f"{prefix}.conv.1.running_var"]}}
    return p, s


def _lstm_cell(sd, prefix: str, reverse: bool):
    """torch bidirectional ``nn.LSTM`` direction → flax OptimizedLSTMCell.
    torch gate order in the stacked [4H, ·] weights is i, f, g, o; flax keeps
    per-gate Dense modules (input side bias-free, so torch's two biases sum
    into the hidden side)."""
    sfx = "_reverse" if reverse else ""
    w_ih = sd[f"{prefix}.weight_ih_l0{sfx}"]
    w_hh = sd[f"{prefix}.weight_hh_l0{sfx}"]
    b = sd[f"{prefix}.bias_ih_l0{sfx}"] + sd[f"{prefix}.bias_hh_l0{sfx}"]
    H = w_hh.shape[1]
    out = {}
    for gi, g in enumerate("ifgo"):
        sl = slice(gi * H, (gi + 1) * H)
        out[f"i{g}"] = {"kernel": w_ih[sl].T}
        out[f"h{g}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
    return out


def _lstm_module(sd, prefix: str):
    """Reference ``LSTMModule`` (``layers_new.py:102-126``)."""
    p, s = {}, {}
    p["conv"], s["conv"] = _conv_bn(sd, f"{prefix}.conv")
    p["OptimizedLSTMCell_0"] = _lstm_cell(sd, f"{prefix}.lstm", reverse=False)
    p["OptimizedLSTMCell_1"] = _lstm_cell(sd, f"{prefix}.lstm", reverse=True)
    p["dense"] = {"kernel": sd[f"{prefix}.dense.0.weight"].T,
                  "bias": sd[f"{prefix}.dense.0.bias"]}
    p["dense_bn"] = {"scale": sd[f"{prefix}.dense.1.weight"],
                     "bias": sd[f"{prefix}.dense.1.bias"]}
    s["dense_bn"] = {"mean": sd[f"{prefix}.dense.1.running_mean"],
                     "var": sd[f"{prefix}.dense.1.running_var"]}
    return p, s


def _aspp(sd, prefix: str):
    """Reference ``ASPPModule`` (``layers_new.py:64-98``); torch ``conv1`` is
    Sequential(AdaptiveAvgPool2d, Conv2DBNActiv) → its ConvBNActiv is ``.1``;
    torch conv3/4/5 map to our plain conv+bn pairs."""
    p, s = {}, {}
    p["conv1"], s["conv1"] = _conv_bn(sd, f"{prefix}.conv1.1")
    p["conv2"], s["conv2"] = _conv_bn(sd, f"{prefix}.conv2")
    for i in (3, 4, 5):
        p[f"conv{i}_conv"] = {"kernel": _cv(sd[f"{prefix}.conv{i}.conv.0.weight"])}
        p[f"conv{i}_bn"] = {"scale": sd[f"{prefix}.conv{i}.conv.1.weight"],
                            "bias": sd[f"{prefix}.conv{i}.conv.1.bias"]}
        s[f"conv{i}_bn"] = {"mean": sd[f"{prefix}.conv{i}.conv.1.running_mean"],
                            "var": sd[f"{prefix}.conv{i}.conv.1.running_var"]}
    p["bottleneck"], s["bottleneck"] = _conv_bn(sd, f"{prefix}.bottleneck")
    return p, s


def _basenet(sd, prefix: str):
    """Reference ``BaseNet`` (``nets_new.py:6-39``)."""
    p, s = {}, {}
    p["enc1"], s["enc1"] = _conv_bn(sd, f"{prefix}.enc1")
    for enc in ("enc2", "enc3", "enc4", "enc5"):
        pe, se = {}, {}
        for c in ("conv1", "conv2"):
            pe[c], se[c] = _conv_bn(sd, f"{prefix}.{enc}.{c}")
        p[enc], s[enc] = pe, se
    p["aspp"], s["aspp"] = _aspp(sd, f"{prefix}.aspp")
    for dec in ("dec4", "dec3", "dec2", "dec1"):
        pd, sd_ = {}, {}
        pd["conv1"], sd_["conv1"] = _conv_bn(sd, f"{prefix}.{dec}.conv1")
        p[dec], s[dec] = pd, sd_
    p["lstm_dec2"], s["lstm_dec2"] = _lstm_module(sd, f"{prefix}.lstm_dec2")
    return p, s


def convert_cascadednet(sd):
    """Reference VR-arch torch state dict → (flax variables, n_fft, nout,
    nout_lstm). Hyper-parameters are inferred from weight shapes (covers the
    ``nn_arch_size == 218409 → nout 64`` quirk, ``nets_new.py:50``)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    nout = sd["out.weight"].shape[1]
    nout_lstm = sd["stg1_low_band_net.0.lstm_dec2.lstm.weight_ih_l0"].shape[0] // 2
    n_fft = 8 * sd["stg1_low_band_net.0.lstm_dec2.dense.0.weight"].shape[0]
    p, s = {}, {}
    p["stg1_low"], s["stg1_low"] = _basenet(sd, "stg1_low_band_net.0")
    p["stg1_low_out"], s["stg1_low_out"] = _conv_bn(sd, "stg1_low_band_net.1")
    p["stg1_high"], s["stg1_high"] = _basenet(sd, "stg1_high_band_net")
    p["stg2_low"], s["stg2_low"] = _basenet(sd, "stg2_low_band_net.0")
    p["stg2_low_out"], s["stg2_low_out"] = _conv_bn(sd, "stg2_low_band_net.1")
    p["stg2_high"], s["stg2_high"] = _basenet(sd, "stg2_high_band_net")
    p["stg3_full"], s["stg3_full"] = _basenet(sd, "stg3_full_band_net")
    p["out"] = {"kernel": _cv(sd["out.weight"])}  # aux_out is training-only
    variables = jax.tree_util.tree_map(
        jnp.asarray, {"params": p, "batch_stats": s}
    )
    return variables, n_fft, nout, nout_lstm


class VRSeparator:
    """Mask-based VR separation: |STFT| → CascadedNet mask → masked iSTFT.
    Minimal inference path of the reference VR arc (``vr_network``)."""

    @classmethod
    def from_file(cls, path: str, hop: int = 1024) -> "VRSeparator":
        """Load reference VR-arch torch weights (``.pth``/``.ckpt``/
        ``.safetensors``) and convert (hyper-params inferred from shapes)."""
        from lemas_tts_tpu.infer.checkpoints import load_state_dict

        sd = load_state_dict(str(path))
        variables, n_fft, nout, nout_lstm = convert_cascadednet(sd)
        return cls(n_fft=n_fft, hop=hop, nout=nout, nout_lstm=nout_lstm,
                   params=variables)

    def __init__(self, n_fft: int = 2048, hop: int = 1024, nout: int = 32,
                 nout_lstm: int = 128, params=None):
        self.n_fft = n_fft
        self.hop = hop
        self.model = CascadedNet(n_fft=n_fft, nout=nout, nout_lstm=nout_lstm)
        if params is None:
            import warnings

            warnings.warn("VR separator: random init (testing only)")
            params = self.model.init(
                jax.random.key(0), jnp.zeros((1, 2, n_fft // 2 + 1, 16))
            )
        self.params = params
        self._run = jax.jit(self.model.apply)

    def separate(self, audio: np.ndarray, sr: int,
                 aggressiveness: float = 0.0) -> np.ndarray:
        """Stereo [2, T] → primary stem [2, T]. ``aggressiveness`` raises the
        mask power in low bands (reference ``spec_utils.adjust_aggr``)."""
        from lemas_tts_tpu.ops.stft import hann_window, istft, stft

        x = np.asarray(audio, dtype=np.float32)
        if x.ndim == 1:
            x = np.stack([x, x])
        elif x.shape[0] == 1:
            x = np.concatenate([x, x], axis=0)
        spec = stft(jnp.asarray(x), self.n_fft, self.hop,
                    window=hann_window(self.n_fft))  # [2, bins, T]
        mag = jnp.abs(spec)[None]  # [1, 2, bins, T]
        mask = self._run(self.params, mag)[0]  # [2, bins, T]
        if aggressiveness > 0:
            split = mask.shape[1] // 2
            mask = mask.at[:, :split].power(1.0 + aggressiveness / 3.0) \
                if hasattr(mask, "power") else \
                mask.at[:, :split].set(mask[:, :split] ** (1.0 + aggressiveness / 3.0))
        out = istft(spec * mask, self.n_fft, self.hop,
                    window=hann_window(self.n_fft), length=x.shape[-1])
        return np.asarray(out)
