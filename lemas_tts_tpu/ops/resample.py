"""Polyphase windowed-sinc resampling as an XLA conv.

Matches ``torchaudio.functional.resample`` numerics (sinc_interp_hann,
lowpass_filter_width=6, rolloff=0.99) — used by the reference to bring ref
audio to 24 kHz (``utils_infer.py:494-496``) and down to 16 kHz for the
prosody encoder (``cfm.py:252-258``). The kernel bank is precomputed on host;
the compute is one strided conv that XLA maps onto the MXU.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=16)
def _sinc_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> tuple[np.ndarray, int]:
    """Kernel bank [new_freq, width*2 + orig_freq] and left pad width."""
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64) / orig_freq
    t = (-np.arange(new_freq, dtype=np.float64) / new_freq)[:, None] + idx[None, :]
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t *= np.pi
    kernel = np.where(t == 0.0, 1.0, np.sin(t) / np.where(t == 0.0, 1.0, t))
    kernel *= window
    kernel *= base_freq / orig_freq
    return kernel.astype(np.float32), width


@partial(jax.jit, static_argnames=("orig_freq", "new_freq"))
def resample(x: jax.Array, orig_freq: int, new_freq: int) -> jax.Array:
    """Resample ``x [..., T]`` from ``orig_freq`` to ``new_freq`` Hz."""
    if orig_freq == new_freq:
        return x
    g = math.gcd(int(orig_freq), int(new_freq))
    o, n = orig_freq // g, new_freq // g
    kernel, width = _sinc_kernel(o, n)

    length = x.shape[-1]
    target_len = int(math.ceil(n * length / o))
    batch_shape = x.shape[:-1]
    xf = x.reshape((-1, 1, length)).astype(jnp.float32)
    xf = jnp.pad(xf, ((0, 0), (0, 0), (width, width + o)))
    # conv: out [B, n, T//o(+1)] — each output channel is one polyphase branch
    out = jax.lax.conv_general_dilated(
        xf,
        jnp.asarray(kernel)[:, None, :],  # [n, 1, K]
        window_strides=(o,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    out = jnp.swapaxes(out, -1, -2).reshape(batch_shape + (-1,))
    return out[..., :target_len]
