"""Host-side audio file IO with zero mandatory native deps.

The reference decodes via ffmpeg/pydub/torchaudio (``utils_infer.py:26,422``).
Here: the C++ runtime decoder (``native/audioproc.cpp``, incl. float32/24-bit
WAV) is the fast path when built; stdlib ``wave`` handles plain PCM WAV;
``soundfile`` and ``ffmpeg`` are used opportunistically for other containers.
"""

from __future__ import annotations

import io
import os
import shutil
import subprocess
import wave
from typing import Tuple

import numpy as np


def _read_wav_stdlib(path: str) -> Tuple[np.ndarray, int]:
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(n)
    if sw == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sw == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width: {sw}")
    if ch > 1:
        data = data.reshape(-1, ch).T  # [ch, T]
    else:
        data = data[None, :]
    return data, sr


def read_audio(path: str) -> Tuple[np.ndarray, int]:
    """Decode an audio file → (float32 [channels, T], sample_rate)."""
    if path.lower().endswith(".wav"):
        try:
            from lemas_tts_tpu.native import audio as native_audio

            with open(path, "rb") as f:
                decoded = native_audio.wav_decode(f.read())
            if decoded is not None:
                return decoded
        except Exception:
            pass
        try:
            return _read_wav_stdlib(path)
        except Exception:
            pass
    try:
        import soundfile as sf  # optional

        data, sr = sf.read(path, dtype="float32", always_2d=True)
        return data.T, sr
    except Exception:
        pass
    if shutil.which("ffmpeg"):
        try:
            out = subprocess.run(
                ["ffmpeg", "-v", "quiet", "-i", path, "-f", "f32le", "-ac", "1", "-"],
                capture_output=True, check=True,
            ).stdout
        except subprocess.CalledProcessError:
            raise RuntimeError(f"cannot decode audio file: {path}")
        try:
            probe = subprocess.run(
                # -select_streams a:0 — containers may list a video stream
                # first, whose sample_rate field is empty
                ["ffprobe", "-v", "quiet", "-select_streams", "a:0",
                 "-show_entries", "stream=sample_rate", "-of", "csv=p=0", path],
                capture_output=True, text=True,
            ).stdout.strip()
        except FileNotFoundError:  # ffmpeg without ffprobe: use the fallback rate
            probe = ""
        rate_line = next((ln for ln in probe.splitlines() if ln.strip()), "")
        sr = int(rate_line) if rate_line.strip().isdigit() else 24000
        return np.frombuffer(out, dtype=np.float32)[None, :], sr
    raise RuntimeError(f"cannot decode audio file: {path}")


def write_wav(path: str, wav: np.ndarray, sample_rate: int) -> None:
    """Write mono/multi-channel float32 [-1,1] audio as 16-bit PCM WAV."""
    wav = np.asarray(wav)
    if wav.ndim == 1:
        wav = wav[None, :]
    pcm = np.clip(wav, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with wave.open(path, "wb") as w:
        w.setnchannels(pcm.shape[0])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.T.tobytes())
