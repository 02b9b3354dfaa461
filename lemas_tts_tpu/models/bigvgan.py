"""BigVGAN vocoder (v2-style generator) in flax.

The reference optionally vocodes with NVIDIA BigGAN-style BigVGAN
(``utils_infer.py:144-158`` loads ``nvidia/bigvgan_v2_24khz_100band_256x``;
the mel variant lives at ``modules.py:30-72`` and is implemented in
``ops/mel.py``). This is a from-scratch JAX implementation of the published
architecture: conv_pre → N× [anti-aliased transposed-conv upsample →
multi-receptive-field AMP resblocks with (log-scale) SnakeBeta activations]
→ anti-aliased activation → conv_post, with Kaiser-windowed sinc filters for
the alias-free up/down sampling around each activation.

Layout is channel-last ([B, T, C]) so every conv lowers to MXU matmuls; the
depthwise anti-aliasing filters are XLA grouped convs. A converter folds the
torch checkpoint's weight-norm (g·v/‖v‖) at load time.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache
from typing import Any, Dict, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class BigVGANConfig:
    """Generator hyper-parameters (defaults: bigvgan_v2_24khz_100band_256x)."""

    num_mels: int = 100
    upsample_initial_channel: int = 1536
    upsample_rates: Tuple[int, ...] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (8, 8, 4, 4, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5),
    )
    activation: str = "snakebeta"  # "snake" | "snakebeta"
    snake_logscale: bool = True
    use_bias_at_final: bool = False
    use_tanh_at_final: bool = False

    @property
    def total_upsample(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out

    @classmethod
    def for_hop(cls, hop_length: int, num_mels: int = 100,
                **kw) -> "BigVGANConfig":
        """Derive upsample rates multiplying to ``hop_length`` (4s then 2s —
        hop 256 reproduces the published v2 24 kHz config)."""
        rates = []
        h = hop_length
        while h % 4 == 0 and len(rates) < 2:
            rates.append(4)
            h //= 4
        while h > 1:
            assert h % 2 == 0, f"hop_length {hop_length} not factorable"
            rates.append(2)
            h //= 2
        return cls(
            num_mels=num_mels,
            upsample_rates=tuple(rates),
            upsample_kernel_sizes=tuple(2 * r for r in rates),
            **kw,
        )


# ----------------------------------------------------- alias-free resampling
@lru_cache(maxsize=16)
def kaiser_sinc_filter1d(cutoff: float, half_width: float,
                         kernel_size: int) -> np.ndarray:
    """LPF taps (alias-free-torch filter design: Kaiser window by desired
    attenuation, normalized sinc)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21.0) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, dtype=np.float32)
    f = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    f /= f.sum()
    return f.astype(np.float32)


def _depthwise(x: jax.Array, taps: jax.Array, stride: int = 1) -> jax.Array:
    """[B, T, C] depthwise conv with shared 1-D taps (VALID)."""
    C = x.shape[-1]
    kernel = jnp.broadcast_to(
        taps.astype(x.dtype)[:, None, None], (taps.shape[0], 1, C)
    )
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=C,
    )


def upsample2x(x: jax.Array, ratio: int = 2) -> jax.Array:
    """Anti-aliased ×ratio upsampling (alias-free-torch ``UpSample1d``)."""
    ks = int(6 * ratio // 2) * 2
    pad = ks // ratio - 1  # reference formula (== ks//2 - ratio//2 at ratio=2)
    pad_left = pad * ratio + (ks - ratio) // 2
    pad_right = pad * ratio + (ks - ratio + 1) // 2
    taps = jnp.asarray(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, ks))
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    y = ratio * _conv_transpose_depthwise(x, taps, ratio)
    return y[:, pad_left: y.shape[1] - pad_right, :]


def _conv_transpose_depthwise(x: jax.Array, taps: jax.Array, stride: int):
    """Depthwise transposed conv: dilate input with zeros then VALID conv with
    flipped taps (mathematically identical to F.conv_transpose1d groups=C)."""
    B, T, C = x.shape
    # zero-stuff via stack+reshape (pure data movement) — a strided
    # .at[::stride].set lowers to a scatter on TPU
    up = jnp.concatenate(
        [x[:, :, None, :], jnp.zeros((B, T, stride - 1, C), x.dtype)], axis=2
    ).reshape(B, T * stride, C)
    k = taps.shape[0]
    up = jnp.pad(up, ((0, 0), (k - 1, k - 1), (0, 0)))
    y = _depthwise(up, taps[::-1])
    return y[:, : (T - 1) * stride + k, :]


def downsample2x(x: jax.Array, ratio: int = 2) -> jax.Array:
    """Anti-aliased ÷ratio downsampling (``DownSample1d``/``LowPassFilter1d``)."""
    ks = int(6 * ratio // 2) * 2
    even = ks % 2 == 0
    pad_left = ks // 2 - int(even)
    pad_right = ks // 2
    taps = jnp.asarray(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, ks))
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return _depthwise(x, taps, stride=ratio)


# ------------------------------------------------------------------- blocks
class SnakeActivation1d(nn.Module):
    """Anti-aliased Snake/SnakeBeta: up2x → snake → down2x (BigVGAN
    ``TorchActivation1d`` + ``activations.Snake[Beta]``)."""

    channels: int
    variant: str = "snakebeta"
    logscale: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, C]
        init = nn.initializers.zeros if self.logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        if self.variant == "snakebeta":
            beta = self.param("beta", init, (self.channels,))
        else:
            beta = alpha
        if self.logscale:
            alpha, beta = jnp.exp(alpha), jnp.exp(beta)
        # keep the compute dtype of the surrounding convs (f32 params would
        # otherwise promote bf16 activations back to f32 here)
        alpha = alpha.astype(x.dtype)
        beta = beta.astype(x.dtype)

        h = upsample2x(x)
        h = h + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(alpha * h))
        return downsample2x(h)


def _wn_conv(features: int, kernel: int, dilation: int = 1, name: str = "",
             dtype=None):
    pad = (kernel * dilation - dilation) // 2
    return nn.Conv(features, (kernel,), kernel_dilation=(dilation,),
                   padding=[(pad, pad)], dtype=dtype, name=name)


class AMPBlock1(nn.Module):
    """MRF resblock: 3× [act → dilated conv → act → conv(d=1)] with residuals
    (BigVGAN ``AMPBlock1``)."""

    channels: int
    kernel_size: int
    dilations: Sequence[int]
    activation: str
    logscale: bool
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for j, d in enumerate(self.dilations):
            h = SnakeActivation1d(self.channels, self.activation, self.logscale,
                                  name=f"act1_{j}")(x)
            h = _wn_conv(self.channels, self.kernel_size, d, name=f"conv1_{j}",
                         dtype=self.compute_dtype)(h)
            h = SnakeActivation1d(self.channels, self.activation, self.logscale,
                                  name=f"act2_{j}")(h)
            h = _wn_conv(self.channels, self.kernel_size, 1, name=f"conv2_{j}",
                         dtype=self.compute_dtype)(h)
            x = x + h
        return x


class BigVGAN(nn.Module):
    """mel [B, num_mels, T] → waveform [B, T × total_upsample]."""

    cfg: BigVGANConfig = BigVGANConfig()
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        c = self.cfg
        x = jnp.swapaxes(mel, -1, -2).astype(self.compute_dtype)  # [B, T, D]
        x = nn.Conv(c.upsample_initial_channel, (7,), padding=[(3, 3)],
                    dtype=self.compute_dtype, name="conv_pre")(x)

        ch = c.upsample_initial_channel
        for i, (rate, k) in enumerate(zip(c.upsample_rates,
                                          c.upsample_kernel_sizes)):
            ch //= 2
            pad = (k - rate) // 2
            x = nn.ConvTranspose(ch, (k,), strides=(rate,), padding="VALID",
                                 transpose_kernel=True,
                                 dtype=self.compute_dtype, name=f"up_{i}")(x)
            x = x[:, pad: x.shape[1] - (k - rate - pad), :]
            acc = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilation_sizes)):
                h = AMPBlock1(ch, rk, rd, c.activation, c.snake_logscale,
                              name=f"res_{i}_{j}")(x)
                acc = h if acc is None else acc + h
            x = acc / len(c.resblock_kernel_sizes)

        x = SnakeActivation1d(ch, c.activation, c.snake_logscale,
                              name="act_post")(x)
        x = nn.Conv(1, (7,), padding=[(3, 3)], use_bias=c.use_bias_at_final,
                    name="conv_post")(x)
        x = x[..., 0].astype(jnp.float32)
        if c.use_tanh_at_final:
            return jnp.tanh(x)
        return jnp.clip(x, -1.0, 1.0)

    def decode(self, mel: jax.Array, frame_mask: jax.Array | None = None):
        """Vocoder-interface parity with :class:`Vocos.decode`. Padded frames
        are re-floored to the log-mel silence floor (zero padding means mel
        energy 1.0 — loud broadband — and the conv stack's receptive field
        would bleed it back into the tail of the valid region)."""
        if frame_mask is not None:
            floor = float(np.log(1e-5))  # get_bigvgan_mel_spectrogram clamp
            mel = jnp.where(frame_mask[:, None, :], mel, floor)
        wav = self(mel)
        if frame_mask is not None:
            up = self.cfg.total_upsample
            sample_mask = jnp.repeat(frame_mask, up, axis=-1)[:, : wav.shape[-1]]
            wav = jnp.where(sample_mask, wav, 0.0)
        return wav


# ----------------------------------------------------------------- converter
def _fold_wn(sd: Mapping[str, np.ndarray], p: str) -> np.ndarray:
    """weight_norm fold: w = g · v / ‖v‖ (norm over in/k dims per out-channel).
    Falls back to a plain ``.weight`` when the ckpt isn't weight-normed."""
    if f"{p}.weight" in sd:
        return np.asarray(sd[f"{p}.weight"])
    g = np.asarray(sd[f"{p}.weight_g"])  # [out, 1, 1]
    v = np.asarray(sd[f"{p}.weight_v"])  # [out, in, k]
    norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _conv_p(sd, p) -> Dict[str, np.ndarray]:
    w = _fold_wn(sd, p)  # torch [out, in, k]
    out = {"kernel": np.transpose(w, (2, 1, 0))}
    if f"{p}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{p}.bias"])
    return out


def _convT_p(sd, p) -> Dict[str, np.ndarray]:
    w = _fold_wn(sd, p)  # torch ConvTranspose1d [in, out, k]
    out = {"kernel": np.transpose(w, (2, 1, 0))}  # [k, out, in] (transpose_kernel)
    if f"{p}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{p}.bias"])
    return out


def _act_p(sd, p, variant: str) -> Dict[str, np.ndarray]:
    out = {"alpha": np.asarray(sd[f"{p}.act.alpha"])}
    if variant == "snakebeta":
        out["beta"] = np.asarray(sd[f"{p}.act.beta"])
    return out


def convert_bigvgan(sd: Mapping[str, np.ndarray],
                    cfg: BigVGANConfig = BigVGANConfig()) -> Dict[str, Any]:
    """NVIDIA BigVGAN generator state dict → flax params."""
    params: Dict[str, Any] = {
        "conv_pre": _conv_p(sd, "conv_pre"),
        "act_post": _act_p(sd, "activation_post", cfg.activation),
        "conv_post": _conv_p(sd, "conv_post"),
    }
    n_res = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        params[f"up_{i}"] = _convT_p(sd, f"ups.{i}.0")
        for j in range(n_res):
            r = f"resblocks.{i * n_res + j}"
            blk: Dict[str, Any] = {}
            for d in range(len(cfg.resblock_dilation_sizes[j])):
                blk[f"conv1_{d}"] = _conv_p(sd, f"{r}.convs1.{d}")
                blk[f"conv2_{d}"] = _conv_p(sd, f"{r}.convs2.{d}")
                blk[f"act1_{d}"] = _act_p(sd, f"{r}.activations.{2 * d}",
                                          cfg.activation)
                blk[f"act2_{d}"] = _act_p(sd, f"{r}.activations.{2 * d + 1}",
                                          cfg.activation)
            params[f"res_{i}_{j}"] = blk
    return params
