"""TPU compute ops: jittable XLA/Pallas signal processing and attention kernels."""

from lemas_tts_tpu.ops.stft import frame_signal, stft_magnitude, istft, hann_window
from lemas_tts_tpu.ops.mel import (
    mel_filterbank_htk,
    mel_filterbank_slaney,
    vocos_mel_spectrogram,
    bigvgan_mel_spectrogram,
    MelFrontend,
)

__all__ = [
    "frame_signal",
    "stft_magnitude",
    "istft",
    "hann_window",
    "mel_filterbank_htk",
    "mel_filterbank_slaney",
    "vocos_mel_spectrogram",
    "bigvgan_mel_spectrogram",
    "MelFrontend",
]
