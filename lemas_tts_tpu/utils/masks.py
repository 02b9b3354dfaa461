"""Mask builders (jittable, static-length).

Semantics match the reference helpers (``lemas_tts/model/utils.py:42-66``),
except that ``length`` is always explicit here: XLA requires static shapes, so
callers pass the padded/bucketed length instead of ``lens.max()``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lens_to_mask(lens: jax.Array, length: int) -> jax.Array:
    """[B] lengths → [B, length] bool mask (True inside each sequence)."""
    seq = jnp.arange(length, dtype=lens.dtype)
    return seq[None, :] < lens[:, None]


def mask_from_start_end_indices(length: int, start: jax.Array, end: jax.Array) -> jax.Array:
    """[B] start/end → [B, length] bool mask, True on [start, end)."""
    seq = jnp.arange(length, dtype=start.dtype)
    return (seq[None, :] >= start[:, None]) & (seq[None, :] < end[:, None])


def mask_from_frac_lengths(
    seq_len: jax.Array, frac_lengths: jax.Array, length: int, rng: jax.Array
) -> jax.Array:
    """Random contiguous span mask covering ``frac`` of each sequence
    (training span-infill mask, reference ``utils.py:58-66``)."""
    span = (frac_lengths * seq_len).astype(jnp.int32)
    max_start = seq_len.astype(jnp.int32) - span
    rand = jax.random.uniform(rng, frac_lengths.shape)
    start = jnp.clip((max_start * rand).astype(jnp.int32), 0, None)
    return mask_from_start_end_indices(length, start, start + span)
