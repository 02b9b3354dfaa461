"""Fused DiT FF-block Pallas kernel: LN → AdaLN-modulate → FF → gate+residual.

Covers the reference chain ``modules.py:627-641`` (DiTBlock mlp half:
``ff_norm`` LayerNorm without affine, ``(1+scale)·x+shift`` modulation,
``FeedForward`` Linear→GELU(tanh)→Linear at ``modules.py:342-353``, then
``x + gate·ff``) in one kernel.

Why: the B=4 xplane profile (docs/performance.md) shows XLA lowering the FF
out-projection inside the block scan with the ``EmitOutputBatchInLanes``
emitter at ~42% MXU efficiency (415 µs vs ~175 µs ideal per block) because
the scan carry is pinned to an N-minor layout. A Pallas call pins standard
``{2,1,0}`` layouts on its operands and result, and the kernel produces the
carry itself, so the whole per-block chain runs at matmul speed with the
carry read exactly once from HBM.

Numerics match the unfused flax chain: LN stats in f32 (fast-variance form,
eps 1e-6), everything else in the compute dtype; matmuls accumulate in f32
on the MXU before rounding (same as XLA's bf16 dot lowering).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from lemas_tts_tpu.ops._pallas import resolve_interpret

_LN_EPS = 1e-6


def _ffn_block_kernel(x_ref, mod_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref, o_ref):
    x = x_ref[0]  # [bn, D] compute dtype
    cdt = x.dtype
    f32 = jnp.float32
    prec = jax.lax.Precision.HIGHEST if cdt == f32 else None

    xf = x.astype(f32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    normed = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)

    mod = mod_ref[0]  # [3, D]: scale / shift / gate rows
    s = mod[0:1]  # [1, D]
    sh = mod[1:2]
    g = mod[2:3]
    m = normed.astype(cdt) * (1 + s) + sh

    h = jax.lax.dot_general(
        m, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec,
    ).astype(cdt) + b1_ref[...]
    h = jax.nn.gelu(h, approximate=True)
    o = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec,
    ).astype(cdt) + b2_ref[...]
    o_ref[0] = x + g * o


def _qkv_block_kernel(x_ref, mod_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                      wv_ref, bv_ref, q_ref, k_ref, v_ref):
    x = x_ref[0]  # [bn, D] compute dtype
    cdt = x.dtype
    f32 = jnp.float32
    prec = jax.lax.Precision.HIGHEST if cdt == f32 else None

    xf = x.astype(f32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    normed = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)

    mod = mod_ref[0]  # [2, D]: scale / shift rows
    m = normed.astype(cdt) * (1 + mod[0:1]) + mod[1:2]

    def proj(w_ref, b_ref, o_ref):
        o_ref[0] = jax.lax.dot_general(
            m, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        ).astype(cdt) + b_ref[...]

    proj(wq_ref, bq_ref, q_ref)
    proj(wk_ref, bk_ref, k_ref)
    proj(wv_ref, bv_ref, v_ref)


def qkv_block(
    x: jax.Array,  # [B, N, D] residual stream (raw, pre-norm)
    scale: jax.Array,  # [B, D] AdaLN scale_msa
    shift: jax.Array,  # [B, D] shift_msa
    wq: jax.Array, bq: jax.Array,  # [D, I], [I]
    wk: jax.Array, bk: jax.Array,
    wv: jax.Array, bv: jax.Array,
    block_n: int = 256,
    interpret: bool | None = None,
):
    """Fused LN → AdaLN-modulate → q/k/v projections (reference
    ``modules.py:615-630`` attn half). Reads the residual stream once and
    keeps all three weight matrices VMEM-resident; returns ``(q, k, v)``
    each ``[B, N, I]`` in the flat layout the nhd attention kernel consumes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = resolve_interpret(interpret)

    B, N, D = x.shape
    I = wq.shape[1]
    assert qkv_block_supported(N, D, I, jnp.dtype(x.dtype).itemsize), (N, D, I)
    bn = min(block_n, N)
    while N % bn:
        bn //= 2

    cdt = x.dtype
    mod2 = jnp.stack([scale.astype(cdt), shift.astype(cdt)], axis=1)  # [B,2,D]
    wmat = lambda w: w.astype(cdt)
    bvec = lambda b: b.astype(cdt).reshape(1, I)

    wspec = pl.BlockSpec((D, I), lambda b, i: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, I), lambda b, i: (0, 0), memory_space=pltpu.VMEM)
    io_spec = pl.BlockSpec((1, bn, D), lambda b, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, bn, I), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, N, I), cdt)
    q, k, v = pl.pallas_call(
        _qkv_block_kernel,
        grid=(B, N // bn),
        in_specs=[
            io_spec,
            pl.BlockSpec((1, 2, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec, bspec, wspec, bspec, wspec, bspec,
        ],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[out_shape, out_shape, out_shape],
        interpret=interpret,
    )(x, mod2, wmat(wq), bvec(bq), wmat(wk), bvec(bk), wmat(wv), bvec(bv))
    return q, k, v


def qkv_block_supported(n: int, d: int, inner: int, itemsize: int = 2) -> bool:
    """128-aligned dims with the three projection matrices VMEM-resident
    (``itemsize`` = bytes per element of the compute dtype — f32 doubles the
    resident-weight footprint and must fail this check on v5e shapes)."""
    return (
        n % 128 == 0
        and d % 128 == 0
        and inner % 128 == 0
        and 3 * d * inner * itemsize <= 9 * 1024 * 1024
    )


def ffn_block_supported(n: int, d: int, inner: int, itemsize: int = 2) -> bool:
    """Shapes the kernel handles: 128-aligned dims and both weight matrices
    resident in VMEM (≤ ~9 MB) alongside the activation tiles. ``itemsize``
    is bytes per element of the compute dtype — f32 doubles the footprint
    and correctly fails this check at flagship shapes."""
    return (
        n % 128 == 0
        and d % 128 == 0
        and inner % 128 == 0
        and 2 * d * inner * itemsize <= 9 * 1024 * 1024
    )


def ffn_block(
    x: jax.Array,  # [B, N, D] post-attention residual stream
    scale: jax.Array,  # [B, D] AdaLN scale_mlp
    shift: jax.Array,  # [B, D] shift_mlp
    gate: jax.Array,  # [B, D] gate_mlp
    w1: jax.Array,  # [D, F]
    b1: jax.Array,  # [F]
    w2: jax.Array,  # [F, D]
    b2: jax.Array,  # [D]
    block_n: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """x + gate · FF((LN(x))·(1+scale)+shift); returns [B, N, D]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = resolve_interpret(interpret)

    B, N, D = x.shape
    F = w1.shape[1]
    assert ffn_block_supported(N, D, F, jnp.dtype(x.dtype).itemsize), (N, D, F)
    bn = min(block_n, N)
    while N % bn:
        bn //= 2

    cdt = x.dtype
    mod3 = jnp.stack(
        [scale.astype(cdt), shift.astype(cdt), gate.astype(cdt)], axis=1
    )  # [B, 3, D] — one operand, sliced per row in index maps
    w1c = w1.astype(cdt)
    w2c = w2.astype(cdt)
    b1c = b1.astype(cdt).reshape(1, F)
    b2c = b2.astype(cdt).reshape(1, D)

    out = pl.pallas_call(
        _ffn_block_kernel,
        grid=(B, N // bn),
        in_specs=[
            pl.BlockSpec((1, bn, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, F), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, D), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), cdt),
        interpret=interpret,
    )(x, mod3, w1c, b1c, w2c, b2c)
    return out
