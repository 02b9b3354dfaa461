"""Ring attention: sequence-parallel self-attention over a mesh axis.

The reference has no sequence parallelism (SURVEY.md §5 "long-context": it
hard-caps utterances at 4096 mel frames and synthesizes on one GPU). This is
the TPU-native scaling path the cap leaves on the table: shard the *sequence*
axis of one utterance over chips and let attention stream key/value chunks
around the ICI ring — each device holds ``N/s`` query rows, computes one
``[Nl, Nl]`` score tile per ring step against the kv chunk it currently
holds, folds it into an online softmax (same running max/denominator math as
the kv-chunked Pallas kernel, ``ops/attention.py``), and ``ppermute``s the kv
chunk to its ring neighbor. After ``s`` steps every query row has attended to
every key; no device ever materializes the full ``[N, N]`` score matrix or
the full kv.

Collectives ride the ICI ring (one ``ppermute`` of ``2·B·Nl·H·dh`` elements
per step) and overlap with the score/accumulate compute of the chunk already
on-device — the standard ring-attention schedule.

Numerics match ``ops/attention.py:sdpa`` (f32 scores and softmax statistics,
compute-dtype probability·value matmul with f32 accumulation, masked keys at
``-1e30`` so fully-masked rows degrade to uniform attention instead of NaN —
padded queries are zeroed by the caller, same contract as every other
backend). Reduction order differs from one-shot softmax by the online
rescaling, so outputs agree to float tolerance, not bit-exactly.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def ring_attention(
    q: jax.Array,  # [B, H, Nl, dh] local query shard (rope already applied)
    k: jax.Array,  # [B, H, Nl, dh] local key shard
    v: jax.Array,  # [B, H, Nl, dh] local value shard
    mask: Optional[jax.Array],  # [B, Nl] local key-padding mask (True = keep)
    axis_name: str,
) -> jax.Array:
    """Exact attention over the global sequence sharded on ``axis_name``.

    Must be called inside ``shard_map``/``pjit``-manual context where
    ``axis_name`` is a mesh axis; with axis size 1 it degenerates to plain
    single-device attention.
    """
    B, H, Nl, dh = q.shape
    s = jax.lax.axis_size(axis_name)
    scale = 1.0 / math.sqrt(dh)
    cdt = v.dtype

    if mask is None:
        mask = jnp.ones((B, Nl), bool)

    qf = q.astype(jnp.float32) * scale
    ring = [(i, (i + 1) % s) for i in range(s)]

    acc = jnp.zeros((B, H, Nl, dh), jnp.float32)
    m = jnp.full((B, H, Nl, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((B, H, Nl, 1), jnp.float32)
    kc, vc, mc = k, v, mask
    # static Python loop (axis size is a compile-time int): the last step
    # skips the rotation — its result would be discarded, and one [Nl, H·dh]
    # kv pair per block per ODE step is real ICI bandwidth
    for i in range(s):
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, kc.astype(jnp.float32)
        )  # [B, H, Nl, Nl] f32
        logits = jnp.where(mc[:, None, None, :], logits, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(cdt), vc,
            preferred_element_type=jnp.float32,
        )
        m = m_new
        if i + 1 < s:
            kc, vc, mc = jax.lax.ppermute((kc, vc, mc), axis_name, ring)
    return (acc / l).astype(cdt)


def halo_exchange(
    x: jax.Array,  # [B, Nl, D] local sequence shard
    halo: int,
    axis_name: str,
) -> jax.Array:
    """Prepend/append ``halo`` frames from the ring neighbors (zeros at the
    global sequence edges — matching SAME zero padding). Returns
    ``[B, Nl + 2·halo, D]``. Requires ``Nl ≥ halo``."""
    B, Nl, D = x.shape
    if Nl < halo:
        raise ValueError(
            f"sequence shard ({Nl}) shorter than conv halo ({halo}); "
            f"use a longer bucket or fewer sequence shards"
        )
    s = jax.lax.axis_size(axis_name)
    if s == 1:
        pad = jnp.zeros((B, halo, D), x.dtype)
        return jnp.concatenate([pad, x, pad], axis=1)
    # shift right: device i receives the left neighbor's trailing frames
    from_left = jax.lax.ppermute(
        x[:, Nl - halo:], axis_name, [(i, i + 1) for i in range(s - 1)]
    )
    # shift left: device i receives the right neighbor's leading frames
    from_right = jax.lax.ppermute(
        x[:, :halo], axis_name, [(i + 1, i) for i in range(s - 1)]
    )
    return jnp.concatenate([from_left, x, from_right], axis=1)
