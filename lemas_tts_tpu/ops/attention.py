"""Self-attention kernels for the DiT inner loop.

Two interchangeable implementations with identical semantics:
 - ``sdpa``: plain XLA scaled-dot-product attention (fp32 softmax), matching
   ``F.scaled_dot_product_attention`` (reference ``modules.py:490``).
 - ``flash_attention``: fused Pallas TPU kernel (online-softmax tiling) for
   long sequences; numerics agree with ``sdpa`` to fp32 tolerance.

Layout is ``[batch, heads, seq, head_dim]`` throughout. ``mask`` is a
key-padding mask ``[batch, seq]`` (True = keep), applied to keys only — the
reference masks padded *queries* separately after the output projection
(``modules.py:499-501``), and so do our callers.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
) -> jax.Array:
    """XLA attention. q,k,v: [B,H,N,D]; mask: [B,N] key mask or None."""
    dtype = q.dtype
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# Pallas fused attention (non-causal, key-padding mask) for TPU.
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_k: int, sm_scale: float):
    """One (batch*head, q-block) program: stream K/V blocks with online softmax."""
    q = q_ref[0].astype(jnp.float32) * sm_scale  # [block_q, d]
    block_q, head_dim = q.shape
    kv_len = k_ref.shape[1]

    m = jnp.full((block_q, 1), _NEG_INF, dtype=jnp.float32)
    l = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc = jnp.zeros((block_q, head_dim), dtype=jnp.float32)

    num_kb = kv_len // block_k

    def body(i, carry):
        m_prev, l_prev, acc_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        msk = mask_ref[0, pl.ds(i * block_k, block_k)]  # [block_k] bool

        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # [bq, bk]
        s = jnp.where(msk[None, :], s, _NEG_INF)

        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)
        alpha = jnp.exp(m_prev - m_cur)
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_cur = acc_prev * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return m_cur, l_cur, acc_cur

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    block_q: int = 256,
    block_k: int = 256,
) -> jax.Array:
    """Fused TPU attention. q,k,v: [B,H,N,D] with N a multiple of block sizes
    (callers bucket N); mask: [B,N] bool key mask (True = attend)."""
    B, H, N, D = q.shape
    if N % block_q or N % block_k:
        return sdpa(q, k, v, mask)
    if mask is None:
        mask = jnp.ones((B, N), dtype=jnp.bool_)

    sm_scale = 1.0 / math.sqrt(D)
    bh = B * H
    qf = q.reshape(bh, N, D)
    kf = k.reshape(bh, N, D)
    vf = v.reshape(bh, N, D)
    maskf = jnp.repeat(mask, H, axis=0)  # [B*H, N]

    grid = (bh, N // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, N), lambda b, i: (b, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, N, D), q.dtype),
    )(qf, kf, vf, maskf)
    return out.reshape(B, H, N, D)


def attention(q, k, v, mask=None, use_flash: bool = False):
    """Dispatch between the Pallas kernel and XLA attention."""
    if use_flash:
        return flash_attention(q, k, v, mask)
    return sdpa(q, k, v, mask)
