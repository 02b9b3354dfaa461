"""Rotary position embeddings, x_transformers-compatible.

The reference DiT uses ``x_transformers.RotaryEmbedding(dim_head)`` with the
*interleaved pair* convention (``dit.py:143,236``; ``modules.py:470-480``):
``freqs`` are per-pair angles duplicated along the last axis, and
``rotate_half`` rotates adjacent element pairs ``(x0,x1) -> (-x1, x0)``.
Checkpoint parity depends on reproducing this exact convention (rope has no
weights but changes every attention output).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rope_angles(seq_len: int, dim: int, theta: float = 10000.0) -> jax.Array:
    """Per-position, per-pair rotation angles [seq_len, dim//2] (float32)."""
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    t = np.arange(seq_len, dtype=np.float32)
    return jnp.asarray(np.outer(t, inv_freq))


def apply_rope(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Rotate ``x [..., seq, dim]`` by ``angles [seq, dim//2]`` (interleaved pairs).

    Equivalent to x_transformers ``apply_rotary_pos_emb`` with duplicated freqs
    and xpos scale 1.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    even = xf[..., 0::2]
    odd = xf[..., 1::2]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    out_even = even * cos - odd * sin
    out_odd = odd * cos + even * sin
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)


def abs_pos_embedding(dim: int, max_pos: int, theta: float = 10000.0) -> np.ndarray:
    """Absolute sinusoidal table [max_pos, dim] = concat(cos, sin) halves.

    Matches reference ``precompute_freqs_cis`` (``modules.py:196-207``) used as
    the additive text position embedding (``dit.py:44,66-70``).
    """
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32)[: dim // 2] / dim))
    t = np.arange(max_pos, dtype=np.float32)
    f = np.outer(t, freqs)
    return np.concatenate([np.cos(f), np.sin(f)], axis=-1).astype(np.float32)
