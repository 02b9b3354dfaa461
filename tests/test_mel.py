"""Mel frontend parity: JAX XLA mel vs a plain-torch mirror of the reference
extractors (torchaudio MelSpectrogram / BigVGAN-librosa semantics,
reference modules.py:30-101)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lemas_tts_tpu.ops.mel import (
    vocos_mel_spectrogram,
    bigvgan_mel_spectrogram,
    mel_filterbank_htk,
    mel_filterbank_slaney,
)
from lemas_tts_tpu.ops.stft import istft, stft, hann_window


def torch_melscale_fbanks_htk(n_freqs, n_mels, sr, f_min=0.0, f_max=None):
    """Mirror of torchaudio.functional.melscale_fbanks(norm=None, mel_scale='htk')."""
    f_max = f_max or sr / 2.0
    all_freqs = torch.linspace(0, sr // 2, n_freqs)
    hz2mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)
    m_pts = torch.linspace(hz2mel(f_min), hz2mel(f_max), n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return torch.clamp(torch.min(down, up), min=0.0)  # (n_freqs, n_mels)


def torch_vocos_mel(wav: torch.Tensor, n_fft=1024, hop=256, win=1024, sr=24000, n_mels=100):
    """Mirror of get_vocos_mel_spectrogram (torchaudio MelSpectrogram, power=1)."""
    window = torch.hann_window(win)
    spec = torch.stft(
        wav, n_fft, hop_length=hop, win_length=win, window=window,
        center=True, pad_mode="reflect", normalized=False, onesided=True,
        return_complex=True,
    ).abs()
    fb = torch_melscale_fbanks_htk(n_fft // 2 + 1, n_mels, sr)
    mel = torch.matmul(fb.T, spec)
    return mel.clamp(min=1e-5).log()


def torch_bigvgan_mel(wav: torch.Tensor, n_fft=1024, hop=256, win=1024, sr=24000, n_mels=100):
    """Mirror of get_bigvgan_mel_spectrogram (librosa slaney fb, center=False)."""
    window = torch.hann_window(win)
    pad = (n_fft - hop) // 2
    wav = torch.nn.functional.pad(wav.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        wav, n_fft, hop_length=hop, win_length=win, window=window,
        center=False, normalized=False, onesided=True, return_complex=True,
    )
    spec = torch.sqrt(torch.view_as_real(spec).pow(2).sum(-1) + 1e-9)
    fb = torch.from_numpy(mel_filterbank_slaney(n_fft // 2 + 1, n_mels, sr))
    mel = torch.matmul(fb, spec)
    return mel.clamp(min=1e-5).log()


@pytest.fixture(scope="module")
def wav():
    rng = np.random.default_rng(0)
    t = np.arange(24000 * 2) / 24000.0
    sig = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.1 * rng.standard_normal(t.shape)
    return np.stack([sig, 0.3 * np.sin(2 * np.pi * 440 * t)]).astype(np.float32)


def _assert_logmel_parity(ours, ref):
    """Parity budget is mel MSE < 1e-3 (BASELINE.md). float32 log amplifies
    noise near the 1e-5 clamp floor, so also check tightly above the floor."""
    assert np.mean((ours - ref) ** 2) < 1e-3
    above = ref > np.log(1e-4)
    assert np.mean((ours[above] - ref[above]) ** 2) < 1e-5
    # linear-domain absolute error stays at float32 noise level
    assert np.max(np.abs(np.exp(ours) - np.exp(ref))) < 1e-3


def test_vocos_mel_matches_torch(wav):
    ours = np.asarray(vocos_mel_spectrogram(jnp.asarray(wav)))
    ref = torch_vocos_mel(torch.from_numpy(wav)).numpy()
    assert ours.shape == ref.shape == (2, 100, 24000 * 2 // 256 + 1)
    _assert_logmel_parity(ours, ref)


def test_bigvgan_mel_matches_torch(wav):
    ours = np.asarray(bigvgan_mel_spectrogram(jnp.asarray(wav)))
    ref = torch_bigvgan_mel(torch.from_numpy(wav)).numpy()
    assert ours.shape == ref.shape
    _assert_logmel_parity(ours, ref)


def test_htk_fbank_matches_torch_mirror():
    ours = mel_filterbank_htk(513, 100, 24000)
    ref = torch_melscale_fbanks_htk(513, 100, 24000).numpy().T
    np.testing.assert_allclose(ours, ref, atol=2e-5)  # float32 libm noise


def test_stft_roundtrip_istft(wav):
    """iSTFT(STFT(x)) == x in the interior (COLA with hann/hop=n_fft/4)."""
    x = jnp.asarray(wav)
    spec = stft(x, 1024, 256, window=hann_window(1024))
    rec = np.asarray(istft(spec, 1024, 256, length=wav.shape[-1]))
    # edges lack full overlap; compare interior
    assert np.max(np.abs(rec[:, 1024:-1024] - wav[:, 1024:-1024])) < 1e-4


def test_istft_matches_torch(wav):
    """iSTFT parity vs torch.istft (drives Vocos head waveform parity)."""
    x = torch.from_numpy(wav)
    window = torch.hann_window(1024)
    spec_t = torch.stft(x, 1024, 256, window=window, center=True, return_complex=True)
    ref = torch.istft(spec_t, 1024, 256, window=window, center=True, length=wav.shape[-1])
    spec_j = jnp.asarray(spec_t.numpy())
    ours = np.asarray(istft(spec_j, 1024, 256, length=wav.shape[-1]))
    assert np.max(np.abs(ours - ref.numpy())) < 1e-4
