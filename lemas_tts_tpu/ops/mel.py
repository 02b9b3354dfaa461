"""Jittable mel-spectrogram frontend (XLA graph).

Replaces the reference's torchaudio/librosa mel extractors
(``lemas_tts/model/modules.py:30-101``) with a pure-XLA pipeline:
reflect pad → framed STFT → magnitude → mel matmul → log-clamp. The mel
filterbank matmul maps onto the MXU; everything fuses under jit.

Two numerically distinct variants, matching the reference exactly:
 - "vocos": torchaudio ``MelSpectrogram`` semantics (center=True, power=1,
   HTK mel scale, norm=None)  — ``modules.py:75-101``
 - "bigvgan": librosa mel (Slaney scale + slaney area norm), center=False
   with manual reflect pad, ``sqrt(|S|^2 + 1e-9)`` — ``modules.py:30-72``
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from lemas_tts_tpu.ops.stft import stft_magnitude


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    safe_f = np.maximum(f, 1e-10)  # avoid log(0) warning; masked below anyway
    return np.where(
        f >= min_log_hz, min_log_mel + np.log(safe_f / min_log_hz) / logstep, mels
    )


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=8)
def mel_filterbank_htk(
    n_freqs: int, n_mels: int, sample_rate: int, f_min: float = 0.0, f_max: float | None = None
) -> np.ndarray:
    """Triangular filterbank [n_mels, n_freqs], HTK scale, no norm.

    Bit-matches ``torchaudio.functional.melscale_fbanks(..., mel_scale="htk",
    norm=None)`` (computed in float32 like torchaudio).
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs, dtype=np.float32)
    m_min, m_max = _hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2, dtype=np.float32)
    f_pts = _mel_to_hz_htk(m_pts).astype(np.float32)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up)).astype(np.float32)  # (n_freqs, n_mels)
    return fb.T.copy()


@lru_cache(maxsize=8)
def mel_filterbank_slaney(
    n_freqs: int, n_mels: int, sample_rate: int, f_min: float = 0.0, f_max: float | None = None
) -> np.ndarray:
    """Librosa-default mel filterbank [n_mels, n_freqs]: Slaney scale + slaney norm.

    Matches ``librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax)`` used by the
    BigVGAN mel path (``modules.py:45``).
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    fftfreqs = np.linspace(0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(_hz_to_mel_slaney(f_min), _hz_to_mel_slaney(f_max), n_mels + 2)
    f_pts = _mel_to_hz_slaney(m_pts)
    fdiff = np.diff(f_pts)
    ramps = f_pts[:, None] - fftfreqs[None, :]  # (n_mels+2, n_freqs)
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "sample_rate", "n_mels"))
def vocos_mel_spectrogram(
    waveform: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    sample_rate: int = 24000,
    n_mels: int = 100,
) -> jax.Array:
    """Log-mel ``[..., n_mels, n_frames]`` matching ``get_vocos_mel_spectrogram``.

    torchaudio MelSpectrogram semantics: center=True reflect pad, periodic Hann,
    power=1 (magnitude), HTK fb with norm=None, then ``clamp(min=1e-5).log()``.
    """
    mag = stft_magnitude(
        waveform.astype(jnp.float32), n_fft, hop_length, win_length, center=True
    )
    fb = jnp.asarray(mel_filterbank_htk(n_fft // 2 + 1, n_mels, sample_rate))
    mel = jnp.einsum("mf,...ft->...mt", fb, mag, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.clip(mel, min=1e-5))


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "sample_rate", "n_mels"))
def bigvgan_mel_spectrogram(
    waveform: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    sample_rate: int = 24000,
    n_mels: int = 100,
) -> jax.Array:
    """Log-mel matching ``get_bigvgan_mel_spectrogram`` (``modules.py:30-72``):
    manual reflect pad of (n_fft-hop)//2, center=False, ``sqrt(|S|^2+1e-9)``,
    librosa slaney filterbank."""
    x = waveform.astype(jnp.float32)
    pad = (n_fft - hop_length) // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    mag = stft_magnitude(x, n_fft, hop_length, win_length, center=False, eps=1e-9)
    fb = jnp.asarray(mel_filterbank_slaney(n_fft // 2 + 1, n_mels, sample_rate))
    mel = jnp.einsum("mf,...ft->...mt", fb, mag, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.clip(mel, min=1e-5))


class MelFrontend:
    """Configured mel extractor (the jittable analogue of reference ``MelSpec``,
    ``modules.py:104-143``). Callable on ``[..., T]`` waveforms; returns
    ``[..., n_mels, n_frames]`` log-mels."""

    def __init__(
        self,
        n_fft: int = 1024,
        hop_length: int = 256,
        win_length: int = 1024,
        n_mel_channels: int = 100,
        target_sample_rate: int = 24000,
        mel_spec_type: str = "vocos",
    ):
        assert mel_spec_type in ("vocos", "bigvgan"), mel_spec_type
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_mel_channels = n_mel_channels
        self.target_sample_rate = target_sample_rate
        self.mel_spec_type = mel_spec_type
        self._fn = (
            vocos_mel_spectrogram if mel_spec_type == "vocos" else bigvgan_mel_spectrogram
        )

    def __call__(self, waveform: jax.Array) -> jax.Array:
        return self._fn(
            waveform,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            sample_rate=self.target_sample_rate,
            n_mels=self.n_mel_channels,
        )
