"""Objective evaluation metrics for TTS output.

The reference ships no evaluation at all (SURVEY §4: zero tests, no
benchmarks; its paper metrics are computed out-of-repo). This module makes
the framework's quality measurable in-repo:

 - mel-domain: masked MSE/MAE (the BASELINE.json parity metric is
   mel MSE < 1e-3) and MCD (mel-cepstral distortion, the standard TTS
   spectral metric, with optional DTW alignment for length-mismatched
   outputs);
 - speaker: cosine similarity of ECAPA speaker-encoder embeddings
   (``models/speaker.py``) — zero-shot TTS's voice-cloning fidelity metric;
 - text: WER/CER against a transcript (pair with ``infer/asr.py`` to score
   intelligibility end-to-end).

Mel/MCD math runs as jittable XLA; DTW and edit distance are host-side
numpy/python (eval-time alignment, not a TPU workload).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------- mel


def _length_mask(x: jax.Array, lengths: Optional[jax.Array]) -> jax.Array:
    B, T = x.shape[:2]
    if lengths is None:
        return jnp.ones((B, T), bool)
    return jnp.arange(T)[None, :] < jnp.asarray(lengths)[:, None]


def mel_mse(a: jax.Array, b: jax.Array,
            lengths: Optional[jax.Array] = None) -> jax.Array:
    """Masked mean-squared error between two [B, T, D] mels (the BASELINE
    parity metric)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    m = _length_mask(a, lengths)[..., None]
    se = jnp.square(a - b) * m
    return jnp.sum(se) / jnp.maximum(jnp.sum(m) * a.shape[-1], 1.0)


def spectral_distance(wav_a: jax.Array, wav_b: jax.Array,
                      n_fft: int = 1024, hop_length: int = 256):
    """Waveform-domain divergence between [B, T] (or [T]) waveform batches:
    ``(spectral_convergence, log_stft_mae)``.

    - spectral convergence ‖|A|−|B|‖_F / ‖|B|‖_F — relative magnitude-STFT
      error, scale-free (the standard vocoder-eval metric pair);
    - log-STFT magnitude MAE — perceptual-ish dB-domain error.

    Used by bench.py's waveform-level approximation gate: the mel-domain
    ``approx_mel_mse`` alone can't see error the vocoder amplifies
    non-uniformly (Vocos's iSTFT head is phase-sensitive in high bands)."""
    from lemas_tts_tpu.ops.stft import stft_magnitude

    a = jnp.atleast_2d(jnp.asarray(wav_a, jnp.float32))
    b = jnp.atleast_2d(jnp.asarray(wav_b, jnp.float32))
    t = min(a.shape[-1], b.shape[-1])
    ma = stft_magnitude(a[:, :t], n_fft, hop_length)
    mb = stft_magnitude(b[:, :t], n_fft, hop_length)
    sc = jnp.linalg.norm(ma - mb) / jnp.maximum(jnp.linalg.norm(mb), 1e-9)
    log_mae = jnp.mean(jnp.abs(jnp.log(ma + 1e-5) - jnp.log(mb + 1e-5)))
    return sc, log_mae


def mel_mae(a: jax.Array, b: jax.Array,
            lengths: Optional[jax.Array] = None) -> jax.Array:
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    m = _length_mask(a, lengths)[..., None]
    ae = jnp.abs(a - b) * m
    return jnp.sum(ae) / jnp.maximum(jnp.sum(m) * a.shape[-1], 1.0)


def _dct_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II basis [n_out, n_in] (cepstra from log-mel)."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    basis = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    basis *= np.sqrt(2.0 / n_in)
    basis[0] *= np.sqrt(0.5)
    return basis.astype(np.float32)


def mel_cepstra(log_mel: jax.Array, n_coeffs: int = 13) -> jax.Array:
    """[..., T, D] log-mel → [..., T, n_coeffs] mel-cepstra (DCT-II)."""
    D = log_mel.shape[-1]
    basis = jnp.asarray(_dct_matrix(n_coeffs, D))
    return jnp.asarray(log_mel, jnp.float32) @ basis.T


_MCD_CONST = 10.0 / math.log(10.0) * math.sqrt(2.0)


def mcd(
    a: np.ndarray,
    b: np.ndarray,
    n_coeffs: int = 13,
    use_dtw: bool = False,
) -> float:
    """Mel-cepstral distortion in dB between two [T, D] log-mels.

    Coefficient 0 (overall energy) is excluded, per convention. With
    ``use_dtw`` the frame sequences are DTW-aligned first (host-side
    O(T_a·T_b)) so outputs of different lengths/pacing compare fairly;
    otherwise the common prefix of frames is compared 1:1.
    """
    ca = np.asarray(mel_cepstra(jnp.asarray(a), n_coeffs))[:, 1:]
    cb = np.asarray(mel_cepstra(jnp.asarray(b), n_coeffs))[:, 1:]
    if use_dtw:
        pairs = _dtw_path(ca, cb)
        diff = ca[[i for i, _ in pairs]] - cb[[j for _, j in pairs]]
    else:
        t = min(len(ca), len(cb))
        diff = ca[:t] - cb[:t]
    per_frame = np.sqrt(np.sum(diff * diff, axis=-1))
    return float(_MCD_CONST * np.mean(per_frame))


def _dtw_path(a: np.ndarray, b: np.ndarray) -> list[tuple[int, int]]:
    """Classic O(T²) DTW on Euclidean frame distance; returns the warp path."""
    ta, tb = len(a), len(b)
    dist = np.sqrt(
        np.maximum(
            np.sum(a * a, -1)[:, None] - 2 * a @ b.T + np.sum(b * b, -1)[None, :],
            0.0,
        )
    )
    acc = np.full((ta + 1, tb + 1), np.inf, np.float64)
    acc[0, 0] = 0.0
    for i in range(1, ta + 1):
        row_prev = acc[i - 1]
        row = acc[i]
        for j in range(1, tb + 1):
            row[j] = dist[i - 1, j - 1] + min(
                row_prev[j], row[j - 1], row_prev[j - 1]
            )
    path = []
    i, j = ta, tb
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        moves = ((acc[i - 1, j - 1], i - 1, j - 1),
                 (acc[i - 1, j], i - 1, j),
                 (acc[i, j - 1], i, j - 1))
        _, i, j = min(moves)
    path.reverse()
    return path


# ------------------------------------------------------------------ speaker


def speaker_similarity(
    encoder,
    params,
    mel_a: jax.Array,
    mel_b: jax.Array,
) -> float:
    """Cosine similarity of speaker embeddings of two [T, D] (or [B, T, D])
    mels through a ``models.speaker.SpeakerEncoder``. 1.0 = same voice."""
    def embed(m):
        m = jnp.asarray(m, jnp.float32)
        if m.ndim == 2:
            m = m[None]
        e = encoder.apply(params, m)
        if isinstance(e, tuple):
            e = e[0]
        e = e.reshape(e.shape[0], -1)
        return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-8)

    ea, eb = embed(mel_a), embed(mel_b)
    return float(jnp.mean(jnp.sum(ea * eb, axis=-1)))


# --------------------------------------------------------------------- text


def _edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance (substitution/insertion/deletion cost 1)."""
    n, m = len(ref), len(hyp)
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[m]


def wer(ref_text: str, hyp_text: str) -> float:
    """Word error rate (whitespace tokens, case-folded)."""
    ref = ref_text.lower().split()
    hyp = hyp_text.lower().split()
    if not ref:
        return 0.0 if not hyp else float(len(hyp))
    return _edit_distance(ref, hyp) / len(ref)


def cer(ref_text: str, hyp_text: str) -> float:
    """Character error rate (whitespace collapsed, case-folded)."""
    ref = " ".join(ref_text.lower().split())
    hyp = " ".join(hyp_text.lower().split())
    if not ref:
        return 0.0 if not hyp else float(len(hyp))
    return _edit_distance(ref, hyp) / len(ref)
