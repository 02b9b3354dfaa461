"""Framed STFT / iSTFT as pure XLA graphs.

TPU-first design notes: the reference leans on ``torch.stft``/``torch.istft``
CUDA kernels (``lemas_tts/model/modules.py:55-66``, and Vocos' iSTFT head).
Here framing is expressed as a gather with static shapes + a batched rFFT so
XLA can fuse the window multiply and lower the FFT natively; iSTFT overlap-add
is a scatter-add with a precomputed window-envelope normalizer. Everything is
shape-static and jit/vmap/pjit friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window, matching ``torch.hann_window(N)`` (periodic=True)."""
    n = np.arange(win_length)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    return jnp.asarray(w, dtype=dtype)


def _num_frames(num_samples: int, n_fft: int, hop_length: int) -> int:
    return 1 + (num_samples - n_fft) // hop_length


def frame_signal(x: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """Slice ``x [..., T]`` into overlapping frames ``[..., n_frames, n_fft]``.

    When the hop divides ``n_fft`` (every mel/Vocos/UVR5 config here), the
    framing is ``r = n_fft/hop`` static slices of a hop-chunked reshape —
    pure data movement, mirroring the ``_istft_core`` fold. The general
    case falls back to a static-index gather (measured equally fast on TPU
    for these shapes — unlike the scatter overlap-add, which was 100×).
    """
    num_samples = x.shape[-1]
    n_frames = _num_frames(num_samples, n_fft, hop_length)
    if n_fft % hop_length == 0:
        r = n_fft // hop_length
        used = (n_frames - 1 + r) * hop_length
        chunks = x[..., :used].reshape(x.shape[:-1] + (n_frames - 1 + r,
                                                       hop_length))
        return jnp.concatenate(
            [chunks[..., j : j + n_frames, :] for j in range(r)], axis=-1
        )
    # [n_frames, n_fft] index grid — static, folded into the gather by XLA.
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    return x[..., idx]


def stft(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    window: jax.Array | None = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Complex STFT of ``x [..., T]`` → ``[..., n_fft//2+1, n_frames]``.

    Matches ``torch.stft(..., onesided=True, normalized=False,
    return_complex=True)`` semantics (reference mel path
    ``modules.py:55-66,83-99``).
    """
    if win_length is None:
        win_length = n_fft
    if window is None:
        window = hann_window(win_length, dtype=x.dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=pad_mode)
    frames = frame_signal(x, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # [..., n_frames, n_bins]
    return jnp.swapaxes(spec, -1, -2)  # [..., n_bins, n_frames]


def stft_magnitude(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    window: jax.Array | None = None,
    center: bool = True,
    pad_mode: str = "reflect",
    eps: float = 0.0,
) -> jax.Array:
    """|STFT|; with ``eps`` matching the BigVGAN ``sqrt(re^2+im^2+1e-9)`` variant."""
    spec = stft(x, n_fft, hop_length, win_length, window, center, pad_mode)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if eps:
        return jnp.sqrt(power + eps)
    return jnp.sqrt(power)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length"))
def _istft_core(spec_real, spec_imag, window, frame_mask, n_fft: int, hop_length: int):
    # spec: [..., n_bins, n_frames] -> frames [..., n_frames, n_fft]
    spec = jax.lax.complex(spec_real, spec_imag)
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * window
    n_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)
    batch_shape = frames.shape[:-2]
    if frame_mask is not None:
        frames = jnp.where(frame_mask[..., None], frames, 0.0)

    # Window-square envelope operand for COLA normalization. With a frame
    # mask, only valid frames contribute — a bucket-padded decode is then
    # bit-equal to an exact-length decode on the valid prefix.
    wsq = jnp.asarray((window * window)[None, :]) * jnp.ones((n_frames, 1), jnp.float32)
    if frame_mask is not None:
        wsq = jnp.where(frame_mask[..., None], wsq[None], 0.0)  # [..., n_frames, n_fft]

    if n_fft % hop_length == 0:
        # TPU-native overlap-add: each frame spans exactly r = n_fft/hop
        # output hop-slots, so the fold is r static pad+adds on hop-sized
        # chunks. The scatter formulation below lowers to a
        # sort + segment-reduce on TPU (~13 ms per [4, 1024-frame] batch vs
        # ~0.1 ms for the fold — the entire Vocos head was scatter-bound).
        def fold(fr):  # fr: [..., n_frames, n_fft] -> [..., out_len]
            r = n_fft // hop_length
            lead = fr.ndim - 2
            chunks = fr.reshape(fr.shape[:-1] + (r, hop_length))
            acc = None
            for j in range(r):
                pad = [(0, 0)] * lead + [(j, r - 1 - j), (0, 0)]
                term = jnp.pad(chunks[..., j, :], pad)
                acc = term if acc is None else acc + term
            return acc.reshape(acc.shape[:-2] + (out_len,))

        out = fold(frames)
        env = fold(wsq)  # [out_len] unmasked, [batch..., out_len] masked
        return out, env

    # General hop: overlap-add via scatter-add over static per-frame offsets.
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    flat_idx = jnp.asarray(idx.reshape(-1))
    flat_frames = frames.reshape(batch_shape + (n_frames * n_fft,))
    out = jnp.zeros(batch_shape + (out_len,), dtype=frames.dtype)
    out = out.at[..., flat_idx].add(flat_frames)
    if frame_mask is not None:
        env = jnp.zeros(batch_shape + (out_len,), dtype=frames.dtype)
        env = env.at[..., flat_idx].add(wsq.reshape(batch_shape + (-1,)))
    else:
        env = jnp.zeros((out_len,), dtype=frames.dtype)
        env = env.at[flat_idx].add(wsq.reshape(-1))
    return out, env


def istft(
    spec: jax.Array,
    n_fft: int,
    hop_length: int,
    window: jax.Array | None = None,
    center: bool = True,
    length: int | None = None,
    eps: float = 1e-11,
    frame_mask: jax.Array | None = None,
) -> jax.Array:
    """Inverse STFT of a complex spectrogram ``[..., n_bins, n_frames]``.

    Matches ``torch.istft(center=True)``: windowed overlap-add normalized by
    the summed squared window, trimmed by ``n_fft//2`` on both ends. Drives the
    Vocos ISTFT head (vocoder waveform parity).

    ``frame_mask [..., n_frames]`` marks valid frames: padded frames are
    excluded from both the signal and the normalization envelope, making
    bucket-padded batch decodes bit-equal to exact-length decodes.
    """
    if window is None:
        window = hann_window(n_fft, dtype=jnp.float32)
    out, env = _istft_core(
        jnp.real(spec).astype(jnp.float32),
        jnp.imag(spec).astype(jnp.float32),
        window.astype(jnp.float32),
        frame_mask,
        n_fft,
        hop_length,
    )
    out = out / jnp.maximum(env, eps)
    if center:
        half = n_fft // 2
        if length is None:
            out = out[..., half:-half]
        else:
            # torch.istft semantics: slice [half : half+length], zero-pad if short
            out = out[..., half:]
            if out.shape[-1] < length:
                out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, length - out.shape[-1])])
            out = out[..., :length]
    elif length is not None:
        if out.shape[-1] < length:
            out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, length - out.shape[-1])])
        out = out[..., :length]
    return out
