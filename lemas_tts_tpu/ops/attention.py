"""Self-attention kernels for the DiT inner loop.

Interchangeable backends with identical semantics (key-padding mask
``[batch, seq]``, True = keep; padded *queries* are zeroed by the caller after
the output projection, mirroring reference ``modules.py:499-501``):

 - ``sdpa``: plain XLA scaled-dot-product attention (fp32 softmax), matching
   ``F.scaled_dot_product_attention`` (reference ``modules.py:490``).
 - ``splash``: the Pallas TPU splash-attention kernel (online-softmax tiling,
   no HBM logits materialization) with segment-ids encoding the padding mask.

Layout is ``[batch, heads, seq, head_dim]`` throughout.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp

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


@lru_cache(maxsize=32)
def _splash_kernel(heads: int, q_len: int, kv_len: int):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    mask = sm.MultiHeadMask([sm.FullMask((q_len, kv_len)) for _ in range(heads)])
    return sk.make_splash_mha(mask, head_shards=1, q_seq_shards=1)


def splash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Fused Pallas attention. q,k,v: [B,H,N,D]; mask: [B,N] (True = valid)."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
    )

    B, H, N, D = q.shape
    if N % 128 != 0:  # splash block constraint; tiny shapes fall back to XLA
        return sdpa(q, k, v, mask)
    kernel = _splash_kernel(H, N, N)
    scaled = (q * (1.0 / math.sqrt(D))).astype(q.dtype)

    if mask is None:
        out = jax.vmap(kernel)(scaled, k, v)
    else:
        seg = mask.astype(jnp.int32)  # pad positions get segment 0, valid 1
        segment_ids = sk.SegmentIds(q=seg, kv=seg)
        out = jax.vmap(kernel)(scaled, k, v, segment_ids)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# VMEM-resident fused attention (Pallas): the DiT hot-loop kernel.
#
# At DiT shapes (N ≤ 4096, D = 64) the whole K/V for one (batch, head) fits in
# VMEM, so one program computes an entire q-block row of the attention without
# ever materializing logits in HBM — the XLA SDPA path spends ~0.5 ms per
# layer on fp32 logit traffic; this kernel removes that entirely.
# ---------------------------------------------------------------------------


def _vmem_attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, sm_scale: float):
    q = q_ref[0]  # [bq, D] compute dtype
    k = k_ref[0]  # [N, D]
    v = v_ref[0]
    msk = mask_ref[0]  # [1, N] bool

    # full precision for f32 inputs (the MXU otherwise rounds f32 matmuls to
    # bf16 passes inside Mosaic — ~2e-3 error); bf16 inputs are unaffected
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    ) * sm_scale  # [bq, N] fp32, lives in VMEM only
    s = jnp.where(msk, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # defer the 1/l normalization to the [bq, D] output (64 cols) instead of
    # dividing the [bq, N] probability tile (N cols) — pure VPU savings
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _pick_block_q(n: int) -> int:
    # keep the fp32 score tile [bq, N] ≤ ~4 MB of VMEM
    budget = 4 * 1024 * 1024 // (4 * n)
    bq = max(128, min(n, (budget // 128) * 128))
    while n % bq:
        bq //= 2
    return max(bq, 128)


def vmem_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused non-causal attention with key-padding mask; q,k,v: [B,H,N,D].

    ``interpret=True`` runs the Pallas kernel in interpreter mode so its
    numerics are testable on CPU CI (the TPU-only kernel otherwise has no
    fake-backend coverage)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, N, D = q.shape
    if N % 128 != 0 or D % 64 != 0:
        return sdpa(q, k, v, mask)
    if mask is None:
        mask = jnp.ones((B, N), dtype=jnp.bool_)

    bq = _pick_block_q(N)
    bh = B * H
    qf = q.reshape(bh, N, D)
    kf = k.reshape(bh, N, D)
    vf = v.reshape(bh, N, D)
    maskf = jnp.repeat(mask[:, None, :], H, axis=0).reshape(bh, 1, N)

    import functools as _ft

    out = pl.pallas_call(
        _ft.partial(_vmem_attn_kernel, sm_scale=1.0 / math.sqrt(D)),
        grid=(bh, N // bq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, N, D), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, maskf)
    return out.reshape(B, H, N, D)


def default_backend() -> str:
    """'vmem' (fused Pallas) on TPU, 'xla' elsewhere (CPU tests, GPUs)."""
    import jax as _jax

    try:
        plat = _jax.devices()[0].platform.lower()
    except Exception:
        return "xla"
    return "vmem" if plat in ("tpu", "axon") else "xla"


def attention(q, k, v, mask=None, backend: str = "xla"):
    """Dispatch between attention kernels: 'xla' (SDPA), 'vmem' (fused Pallas,
    default for TPU inference), 'splash' (JAX splash kernel)."""
    if backend == "splash":
        return splash_attention(q, k, v, mask)
    if backend == "vmem":
        return vmem_attention(q, k, v, mask)
    return sdpa(q, k, v, mask)
