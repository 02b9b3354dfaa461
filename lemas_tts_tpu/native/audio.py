"""ctypes bindings for the native audio DSP library (``native/audioproc.cpp``).

Each function falls back to the numpy/JAX implementation when the shared
library is unavailable, so callers can use this module unconditionally.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from lemas_tts_tpu.native import load_library

_lib = None
_checked = False


def _get() -> Optional[ctypes.CDLL]:
    global _lib, _checked
    if not _checked:
        _checked = True
        lib = load_library("audioproc")
        if lib is not None:
            # full argtypes: without them ctypes passes Python ints as 32-bit
            # C int, silently masking int64_t lengths (>2 GB blobs / >2^31
            # samples would corrupt)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            f32p = ctypes.POINTER(ctypes.c_float)
            i32, i64 = ctypes.c_int32, ctypes.c_int64
            lib.audioproc_wav_info.restype = ctypes.c_int
            lib.audioproc_wav_info.argtypes = [
                u8p, i64, ctypes.POINTER(i32), ctypes.POINTER(i32),
                ctypes.POINTER(i64)]
            lib.audioproc_wav_decode.restype = ctypes.c_int
            lib.audioproc_wav_decode.argtypes = [u8p, i64, f32p]
            lib.audioproc_wav_encode.restype = ctypes.c_int64
            lib.audioproc_wav_encode.argtypes = [f32p, i64, i32, i32, u8p]
            lib.audioproc_resample.restype = ctypes.c_int
            lib.audioproc_resample.argtypes = [f32p, i64, i32, i32, f32p]
            lib.audioproc_resample_len.restype = ctypes.c_int64
            lib.audioproc_resample_len.argtypes = [i64, i32, i32]
            lib.audioproc_scan_dbfs.restype = ctypes.c_int64
            lib.audioproc_scan_dbfs.argtypes = [f32p, i64, i32, i32, i32,
                                                f32p, i64]
            lib.audioproc_rms.restype = ctypes.c_double
            lib.audioproc_rms.argtypes = [f32p, i64]
            lib.audioproc_version.restype = ctypes.c_char_p
            lib.audioproc_version.argtypes = []
        _lib = lib
    return _lib


def native_available() -> bool:
    return _get() is not None


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def wav_decode(data: bytes) -> Optional[Tuple[np.ndarray, int]]:
    """WAV blob → ([channels, frames] float32, sample_rate); None → caller
    should fall back (unsupported codec or no native lib)."""
    lib = _get()
    if lib is None:
        return None
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    ch, sr = ctypes.c_int32(), ctypes.c_int32()
    frames = ctypes.c_int64()
    rc = lib.audioproc_wav_info(buf, len(data), ctypes.byref(ch),
                                ctypes.byref(sr), ctypes.byref(frames))
    if rc != 0:
        return None
    out = np.empty((ch.value, frames.value), dtype=np.float32)
    rc = lib.audioproc_wav_decode(buf, len(data), _f32(out))
    if rc != 0:
        return None
    return out, sr.value


def wav_encode(x: np.ndarray, sample_rate: int) -> Optional[bytes]:
    """[T] or [channels, T] float32 → PCM16 WAV blob (None → fall back)."""
    lib = _get()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    if x.ndim == 1:
        x = x[None]
    channels, frames = x.shape
    total = lib.audioproc_wav_encode(_f32(x), frames, channels, sample_rate, None)
    out = (ctypes.c_uint8 * total)()
    lib.audioproc_wav_encode(_f32(x), frames, channels, sample_rate, out)
    return bytes(out)


def resample(x: np.ndarray, orig_freq: int, new_freq: int) -> Optional[np.ndarray]:
    """1-D windowed-sinc resample, numerics-matched to ops/resample.py
    (None → fall back to the JAX kernel)."""
    lib = _get()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    out_n = lib.audioproc_resample_len(x.shape[-1], orig_freq, new_freq)
    out = np.empty(out_n, dtype=np.float32)
    rc = lib.audioproc_resample(_f32(x), x.shape[-1], orig_freq, new_freq, _f32(out))
    return out if rc == 0 else None


def scan_dbfs(x: np.ndarray, sr: int, win_ms: int, seek_ms: int) -> Optional[np.ndarray]:
    """Sliding-window dBFS profile (the silence-scanning hot loop)."""
    lib = _get()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    cap = max(1, (x.shape[-1] * 1000) // (sr * seek_ms) + 2)
    out = np.empty(cap, dtype=np.float32)
    n = lib.audioproc_scan_dbfs(_f32(x), x.shape[-1], sr, win_ms, seek_ms,
                                _f32(out), cap)
    return out[:n]


def rms(x: np.ndarray) -> Optional[float]:
    lib = _get()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    return float(lib.audioproc_rms(_f32(x), x.shape[-1]))
