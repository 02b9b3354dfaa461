"""Kaldi-compatible log-mel FBANK features (host/device, pure numpy + jax).

Replicates ``torchaudio.compliance.kaldi.fbank`` defaults as used by the
reference prosody path (``prosody_encoder.py:337-361``: 80 bins, 16 kHz,
everything else default): 25 ms povey window / 10 ms shift, snip_edges,
round-to-power-of-two FFT, dither 0, DC offset removal, pre-emphasis 0.97,
power spectrum, Kaldi mel banks (low 20 Hz → Nyquist), natural log with
float-eps floor.

The frame pipeline is implemented as a jittable JAX graph
(:func:`kaldi_fbank`) so prosody feature extraction can run on-device; the
filterbank matrix is precomputed in numpy.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = float(np.finfo(np.float32).eps)  # torchaudio kaldi log floor (fp32)


def _mel(f):
    return 1127.0 * np.log(1.0 + f / 700.0)


@lru_cache(maxsize=8)
def kaldi_mel_banks(
    num_bins: int = 80,
    window_size_padded: int = 512,
    sample_rate: int = 16000,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Triangular mel filterbank, Kaldi layout: [num_bins, n_fft_bins] where
    ``n_fft_bins = window_size_padded // 2`` (Nyquist bin excluded)."""
    n_fft_bins = window_size_padded // 2
    nyquist = 0.5 * sample_rate
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    fft_bin_width = sample_rate / window_size_padded
    mel_low, mel_high = _mel(low_freq), _mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.zeros((num_bins, n_fft_bins), dtype=np.float64)
    for b in range(num_bins):
        left, center, right = (
            mel_low + b * mel_delta,
            mel_low + (b + 1) * mel_delta,
            mel_low + (b + 2) * mel_delta,
        )
        freqs = fft_bin_width * np.arange(n_fft_bins)
        mels = _mel(freqs)
        up = (mels - left) / (center - left)
        down = (right - mels) / (right - center)
        bins[b] = np.clip(np.minimum(up, down), 0.0, None)
    return bins.astype(np.float32)


def _povey_window(n: int) -> np.ndarray:
    a = 2 * math.pi / (n - 1)
    return (0.5 - 0.5 * np.cos(a * np.arange(n))) ** 0.85


def kaldi_fbank(
    waveform: jax.Array,  # [T] or [B, T], float in [-1, 1]
    num_mel_bins: int = 80,
    sample_rate: int = 16000,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
) -> jax.Array:
    """[T] → [frames, num_mel_bins] log-fbank (or batched [B, frames, bins]).

    Note: torchaudio's kaldi.fbank does NOT rescale float input, and the
    reference feeds normalized [-1, 1] audio (``cfm.py:254-261``) — so no
    int16 scaling here either; magnitudes match the reference exactly."""
    squeeze = waveform.ndim == 1
    if squeeze:
        waveform = waveform[None]
    waveform = waveform.astype(jnp.float32)

    window_size = int(sample_rate * frame_length_ms / 1000)  # 400
    window_shift = int(sample_rate * frame_shift_ms / 1000)  # 160
    padded = 1 << (window_size - 1).bit_length()  # next pow2: 512

    from lemas_tts_tpu.ops.stft import frame_signal

    # snip_edges framing == the STFT module's static frame gather
    frames = frame_signal(waveform, window_size, window_shift)  # [B, F, window]

    if remove_dc_offset:
        frames = frames - frames.mean(axis=-1, keepdims=True)
    if preemphasis != 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis * prev
    frames = frames * jnp.asarray(_povey_window(window_size), jnp.float32)

    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, padded - window_size)))
    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1)[..., : padded // 2]) ** 2

    banks = jnp.asarray(kaldi_mel_banks(num_mel_bins, padded, sample_rate))
    mel = spec @ banks.T  # [B, F, bins]
    out = jnp.log(jnp.maximum(mel, EPSILON))
    return out[0] if squeeze else out


def extract_fbank_16k(audio_16k: np.ndarray) -> np.ndarray:
    """80-dim fbank with the reference's min-length repeat guard
    (``prosody_encoder.py:337-361``)."""
    audio_16k = np.asarray(audio_16k, dtype=np.float32)
    if audio_16k.ndim == 2:
        audio_16k = audio_16k[0]
    min_len = 400
    if audio_16k.shape[-1] < min_len:
        audio_16k = np.tile(audio_16k, min_len // max(1, audio_16k.shape[-1]) + 1)
    return np.asarray(kaldi_fbank(jnp.asarray(audio_16k)))
