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

from lemas_tts_tpu.ops._pallas import resolve_interpret

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
    interpret: bool | None = None,
) -> jax.Array:
    """Fused non-causal attention with key-padding mask; q,k,v: [B,H,N,D].

    ``interpret=None`` self-selects: compiled Mosaic on TPU, interpreter mode
    elsewhere so the kernel's numerics are testable on CPU CI."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = resolve_interpret(interpret)

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


# ---------------------------------------------------------------------------
# Flat-layout VMEM attention: q/k/v in [B, N, H·D] — no transposes.
#
# The B=4 profile (docs/performance.md) showed XLA pinning an N-minor layout
# on the DiT block-scan carry because of the [B,N,H·D] → [B·H,N,D] transposes
# around the attention custom call, costing ~42% MXU efficiency on the FF
# out-projection plus explicit copies. This variant consumes the qkv dense
# outputs directly and writes output the to_out projection can consume
# directly. Two heads per program keep every lane window 128-aligned
# (64-lane windows are not addressable on TPU); per-head isolation inside
# the 128-lane pair uses lane masks (zeroed lanes contribute zeros to the
# f32-accumulated matmuls — exact). Rope is applied in-kernel as
# ``x·C + (x@P)·S`` with a constant ±1 pair-swap matrix P (exact on the
# MXU), eliminating the external rope fusion as well.
# ---------------------------------------------------------------------------


def _rope_pair_tables(angles, heads_per_group: int = 2):
    """cos/sin [N, hpg·D] lane tables for the interleaved-pair convention,
    duplicated across pairs and tiled across the heads in one lane group."""
    cos = jnp.repeat(jnp.cos(angles), 2, axis=-1)  # [N, D]
    sin = jnp.repeat(jnp.sin(angles), 2, axis=-1)
    return (jnp.tile(cos, (1, heads_per_group)),
            jnp.tile(sin, (1, heads_per_group)))


def _pair_swap_matrix(width: int):
    """[width, width] ±1 matrix: (x @ P) rotates interleaved pairs
    (x0, x1) -> (-x1, x0)."""
    import numpy as _np

    p = _np.zeros((width, width), _np.float32)
    idx = _np.arange(0, width, 2)
    p[idx + 1, idx] = -1.0
    p[idx, idx + 1] = 1.0
    return jnp.asarray(p)


# online-softmax running-max floor: far above every masked score (-1e30) so
# a fully-masked kv chunk underflows to p = exp(-1e30 + 1e29) = 0 instead of
# the degenerate p = exp(0) = 1, yet far below any real logit
_M_FLOOR = -1e29


def _vmem_attn_nhd_kernel(q_ref, k_ref, v_ref, mask_ref, cq_ref, sq_ref,
                          ck_ref, sk_ref, p_ref, o_ref, kr_ref, *,
                          sm_scale: float, d_head: int, block_kv: int = 0,
                          heads_per_block: int = 2):
    from jax.experimental import pallas as pl

    q2 = q_ref[0]  # [bq, 128]: two d64 heads side by side, or one d128 head
    v2 = v_ref[0]  # [N, 128]
    msk = mask_ref[0]  # [1, N]
    cdt = q2.dtype
    P = p_ref[...].astype(cdt)  # [2D, 2D] pair-swap

    f32 = jnp.float32
    prec = jax.lax.Precision.HIGHEST

    def rope(x, cos, sin, scale=None):
        # pair swap via the MXU in the compute dtype: P is ±1, so a bf16 dot
        # with f32 accumulate is an exact permute/negate of the bf16 values
        # (f32 inputs use HIGHEST to stay exact); combine stays in f32 —
        # numerics identical to the external apply_rope, ~4× cheaper than an
        # f32-HIGHEST dot on the MXU
        swapped = jax.lax.dot_general(
            x, P, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=prec if cdt == f32 else None,
        )
        out = x.astype(f32) * cos + swapped * sin
        if scale is not None:  # fold sm_scale into q here ([bq,2D] lanes)
            out = out * scale  # instead of a [bq,N] f32 pass on the scores
        return out.astype(cdt)

    # k-rope is per-(batch, head-pair), not per-q-block: compute it once on
    # the first q-block into a persistent VMEM scratch. Long buckets run
    # many q-blocks (N=4096/bq=128 → 32) and re-roping the full [N, 2D] k
    # each time was pure N²/bq overhead.
    @pl.when(pl.program_id(2) == 0)
    def _():
        kr_ref[...] = rope(k_ref[0], ck_ref[...], sk_ref[...])

    qr = rope(q2, cq_ref[...], sq_ref[...], scale=sm_scale)
    kr = kr_ref[...]

    if heads_per_block == 1:
        # one d128 head fills the whole 128-lane window: no per-head lane
        # isolation needed, ONE score chain at full MXU contraction depth
        # (the wide-head student geometry — docs/performance.md)
        head_masks = (None,)
    else:
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * d_head), 1)
        m0 = (lanes < d_head).astype(cdt)  # head 0 lanes
        m1 = (lanes >= d_head).astype(cdt)
        head_masks = (m0, m1)

    mprec = None if cdt != jnp.float32 else prec
    n_kv = v2.shape[0]
    # d64: two sequential per-head chains. Probed alternative: stacking both
    # heads into one [2bq, N] score tile (one matmul + one softmax) is
    # neutral at N≤2048 and ~7% WORSE at N=4096 — the doubled f32 tile
    # blows the VMEM budget that the bq sweep below optimizes.
    o_acc = None
    l2 = None
    for hm in head_masks:
        qh = qr if hm is None else qr * hm
        if block_kv and block_kv < n_kv:
            # kv-chunked online softmax (flash-style): the live f32 tile is
            # [bq, block_kv] instead of [bq, N], which unlocks bq=512 at long
            # N where the one-shot tile would blow the VMEM budget. The
            # rescale corrections are [bq, 1]/[bq, 2D] VPU work per chunk —
            # negligible next to the [bq, block_kv] exp.
            m_run = jnp.full((q2.shape[0], 1), _M_FLOOR, f32)
            l_run = jnp.zeros((q2.shape[0], 1), f32)
            o_run = jnp.zeros((q2.shape[0], v2.shape[1]), f32)
            for j in range(n_kv // block_kv):
                sl = slice(j * block_kv, (j + 1) * block_kv)
                s = jax.lax.dot_general(
                    qh, kr[sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=f32, precision=mprec,
                )  # [bq, bkv]
                s = jnp.where(msk[:, sl], s, _NEG_INF)
                m_new = jnp.maximum(m_run, jnp.max(s, axis=-1, keepdims=True))
                alpha = jnp.exp(m_run - m_new)
                p = jnp.exp(s - m_new)
                l_run = l_run * alpha + jnp.sum(p, axis=-1, keepdims=True)
                o_run = o_run * alpha + jax.lax.dot_general(
                    p.astype(cdt), v2[sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=f32, precision=mprec,
                )
                m_run = m_new
            o_part, l = o_run, l_run
        else:
            s = jax.lax.dot_general(
                qh, kr, (((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=mprec,
            )  # [bq, N] — zeroed q lanes restrict the contraction; q pre-scaled
            s = jnp.where(msk, s, _NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)  # [bq, 1]
            o_part = jax.lax.dot_general(
                p.astype(cdt), v2, (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=mprec,
            )  # [bq, 2D]; the other head's lanes hold p·v_other garbage that
            # the hm mask below zeroes — masking the [bq, 2D] output replaces
            # the old [N, 2D] per-program v2·hm pass (N/bq× more VPU work)
        if hm is None:  # single head: no lane isolation, l broadcasts [bq,1]
            o_acc, l2 = o_part, l
        else:
            o_acc = o_part * hm.astype(f32) if o_acc is None \
                else o_acc + o_part * hm.astype(f32)
            lane_l = l * hm.astype(f32)  # normalizer on this head's lanes
            l2 = lane_l if l2 is None else l2 + lane_l
    # fully-masked rows: one-shot l ≥ 1 (uniform over -1e30 scores) but the
    # chunked accumulator underflows to l = 0 (m_run floor −1e29 keeps every
    # exp at 0) — clamp so those rows yield 0 instead of NaN. Either value is
    # garbage the caller zeroes (padded queries), but NaN would poison
    # downstream `where`s under --debug_nans.
    o_ref[0] = (o_acc / jnp.maximum(l2, 1e-30)).astype(o_ref.dtype)


def _vmem_attn_nhd_pack_kernel(q_ref, k_ref, v_ref, mask2_ref, cq_ref, sq_ref,
                               ck_ref, sk_ref, p_ref, o_ref, kcat_ref,
                               vcat_ref, *, sm_scale: float, d_head: int):
    """Head-pair-PACKED variant (VERDICT r3 item 7 probe): instead of two
    sequential per-head chains with half-zero lane contractions, build
    block-diagonal K/V concatenations once per (batch, head-pair) —
    ``kcat[[0:N] = k·m0, [N:2N] = k·m1]`` — so the pair computes in ONE
    [bq,2D]·[2D,2N] score matmul and ONE [bq,2N]·[2N,2D] output matmul
    (head 0's scores land in lanes [:N], head 1's in [N:]; the zero halves
    of kcat/vcat isolate the heads exactly). Same MAC count (the zeros
    remain), but 2 big MXU invocations instead of 4 small ones, and no
    per-q-block q/output lane-masking passes. Softmax stays per-head via
    aligned lane-window slices. One-shot scores only (no kv chunking): the
    live f32 tile is [bq, 2N], so the caller halves bq vs the unpacked
    budget rule."""
    from jax.experimental import pallas as pl

    q2 = q_ref[0]            # [bq, 2D]
    v2 = v_ref[0]            # [N, 2D]
    msk2 = mask2_ref[0]      # [1, 2N] (key mask tiled twice)
    cdt = q2.dtype
    P = p_ref[...].astype(cdt)
    f32 = jnp.float32
    prec = jax.lax.Precision.HIGHEST

    def rope(x, cos, sin, scale=None):
        swapped = jax.lax.dot_general(
            x, P, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=prec if cdt == f32 else None,
        )
        out = x.astype(f32) * cos + swapped * sin
        if scale is not None:
            out = out * scale
        return out.astype(cdt)

    n_kv = v2.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * d_head), 1)
    m0 = (lanes < d_head).astype(cdt)
    m1 = (lanes >= d_head).astype(cdt)

    @pl.when(pl.program_id(2) == 0)
    def _():
        kr = rope(k_ref[0], ck_ref[...], sk_ref[...])
        kcat_ref[0:n_kv] = kr * m0
        kcat_ref[n_kv:2 * n_kv] = kr * m1
        vcat_ref[0:n_kv] = v2 * m0
        vcat_ref[n_kv:2 * n_kv] = v2 * m1

    qr = rope(q2, cq_ref[...], sq_ref[...], scale=sm_scale)
    mprec = None if cdt != f32 else prec
    s = jax.lax.dot_general(
        qr, kcat_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=f32, precision=mprec,
    )  # [bq, 2N]: lanes [:N] = head-0 scores, [N:] = head-1 scores
    s = jnp.where(msk2, s, _NEG_INF)
    # per-head softmax over aligned lane windows (N % 128 == 0)
    mh0 = jnp.max(s[:, :n_kv], axis=-1, keepdims=True)
    mh1 = jnp.max(s[:, n_kv:], axis=-1, keepdims=True)
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * n_kv), 1)
    p = jnp.exp(s - jnp.where(lanes2 < n_kv, mh0, mh1))
    l0 = jnp.sum(p[:, :n_kv], axis=-1, keepdims=True)
    l1 = jnp.sum(p[:, n_kv:], axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(cdt), vcat_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=mprec,
    )  # [bq, 2D]: vcat's zero halves route each head's p to its own lanes
    l_lane = l0 * m0.astype(f32) + l1 * m1.astype(f32)
    o_ref[0] = (o / jnp.maximum(l_lane, 1e-30)).astype(o_ref.dtype)


def nhd_supported(
    heads: int,
    dim_head: int,
    n: int,
    qk_norm=None,
    pe_attn_head=None,
    has_rope: bool = True,
) -> bool:
    """Preconditions of the flat-layout nhd kernel — the single source of
    truth for both the Attention-internal gate and DiTBlock's fused-path
    gate (they must not drift: DiTBlock passes raw x + fused_ln_mod only
    when the kernel can actually run).

    Two head geometries map onto the 128-lane window: d64 head PAIRS
    (flagship checkpoint contract, per-head lane masks) and single d128
    heads (the wide-head student geometry — full MXU contraction depth,
    half the softmax rows; see docs/performance.md)."""
    return (
        qk_norm is None
        and pe_attn_head is None
        and ((dim_head == 64 and heads % 2 == 0) or dim_head == 128)
        and has_rope
        and n % 128 == 0
    )


def vmem_attention_nhd(
    q: jax.Array,  # [B, N, H*D] — qkv dense outputs, heads NOT split
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None,
    angles: jax.Array,  # [N, D//2] rope angles (rope_angles)
    heads: int,
    interpret: bool | None = None,
    block_q: int | None = None,
    block_kv: int | None = None,
    pack_pair: bool = False,
) -> jax.Array:
    """Flat-layout fused attention with in-kernel rope. Returns [B, N, H*D].

    Requirements: N % 128 == 0 and either D = inner//heads == 64 with heads
    even (two heads per 128-lane program, per-head lane masks) or D == 128
    (one head per program — no masks, one score chain at full contraction
    depth). Callers must fall back to the split-head path otherwise.

    ``pack_pair=True`` selects the head-pair-packed probe variant
    (``_vmem_attn_nhd_pack_kernel``): one block-diagonal score matmul + one
    output matmul per pair instead of two per-head chains (VERDICT r3
    item 7). One-shot scores only; the caller's bq budget applies to the
    doubled [bq, 2N] f32 tile. MEASURED (round 4, v5e, bit-exact vs base):
    standalone scan-bench WINS at the headline shape — B=8/N=1024
    2212→1917 µs (1.15×), B=1 neutral (1.02×) — but N=2048 loses 7%
    (halved bq under the doubled tile), N=4096 VMEM-OOMs (scratch +
    tile > 16 MB scoped), and e2e ``LEMAS_ATTN_PACK=1 bench.py`` REGRESSES
    the headline 76.8 → 74.9 (the standalone harness effect, CLAUDE.md —
    in-model the per-(b,h) kcat/vcat scratch build amortizes over only
    N/bq = 2 q-blocks and the extra 1 MB VMEM costs overlap). Verdict:
    probe-only, not a default."""
    from functools import partial as _partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = resolve_interpret(interpret)

    B, N, inner = q.shape
    D = inner // heads
    group = 2 if D == 64 else 1  # heads per 128-lane program
    assert ((D == 64 and heads % 2 == 0) or D == 128) and N % 128 == 0, \
        (heads, D, N)
    gw = group * D  # lane-window width, always 128
    if mask is None:
        mask = jnp.ones((B, N), dtype=jnp.bool_)

    if block_kv is None:
        # kv-chunked online softmax for long buckets (N > 2048). Measured on
        # v5e at N=4096 vs the one-shot [bq, N] tile (rows = 2B):
        # bkv 512 → −10/−12/−15% at rows 2/4/8; bkv 1024 → −7%; 2048 → −4%;
        # 256 → −3%; 128 regresses (unroll bloat). The smaller live tile wins
        # on VMEM pressure, not VPU work. At N ≤ 2048 chunking REGRESSES
        # (1926 vs 1609 µs at N=2048/bq=512/bkv=1024) — keep one-shot there.
        # bq=512 with chunking at N=4096 crashes the Mosaic compiler; bq
        # stays at the 4 MB-budget rule below.
        block_kv = 512 if N > 2048 and N % 512 == 0 else 0
    elif block_kv:
        # the chunk loop has no remainder handling — a non-divisor would
        # silently drop the trailing keys from attention
        assert N % block_kv == 0, (N, block_kv)
    if block_q is not None:
        bq = block_q
        assert N % bq == 0, (N, bq)
    else:
        # measured sweep on v5e (docs/performance.md long-bucket table):
        # largest bq ≤ 512 whose [bq, N] f32 score tile stays ≤ 4 MB wins at
        # every bucket (N=1024/2048 → 512, N=4096 → 256); bq=1024 at N=1024
        # regresses. The same rule holds under kv-chunking (bq=512 + chunks
        # at N=4096 crashes the Mosaic compiler; bq=256 + bkv=512 is the
        # measured optimum).
        bq = min(N, 512)
        while bq > 128 and (bq * N * 4 > 4 * 1024 * 1024 or N % bq):
            bq //= 2
        bq = math.gcd(bq, N)  # non-power-of-two N (e.g. 384): largest divisor
    hg = heads // group  # lane-window groups (head pairs at d64, heads at d128)
    maskf = mask[:, None, :]  # [B, 1, N]
    cos2, sin2 = _rope_pair_tables(angles, group)  # [N, 128]
    P = _pair_swap_matrix(gw)

    if pack_pair:
        # packed probe is pair-specific (block-diag over a d64 head pair)
        assert D == 64, "pack_pair requires dim_head == 64"
        # packed probe: [bq, 2N] f32 score tile → halve bq under the same
        # 4 MB budget; block-diag K/V concat scratches per (b, pair)
        bqp = bq if block_q is not None else max(
            128, bq // (2 if bq * 2 * N * 4 > 4 * 1024 * 1024 else 1))
        mask2 = jnp.tile(maskf, (1, 1, 2))  # [B, 1, 2N]
        out = pl.pallas_call(
            _partial(_vmem_attn_nhd_pack_kernel,
                     sm_scale=1.0 / math.sqrt(D), d_head=D),
            grid=(B, heads // 2, N // bqp),
            in_specs=[
                pl.BlockSpec((1, bqp, 2 * D), lambda b, h, i: (b, i, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, 2 * D), lambda b, h, i: (b, 0, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, 2 * D), lambda b, h, i: (b, 0, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 2 * N), lambda b, h, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bqp, 2 * D), lambda b, h, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bqp, 2 * D), lambda b, h, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, 2 * D), lambda b, h, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, 2 * D), lambda b, h, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * D, 2 * D), lambda b, h, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bqp, 2 * D), lambda b, h, i: (b, i, h),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N, inner), q.dtype),
            scratch_shapes=[pltpu.VMEM((2 * N, 2 * D), q.dtype),   # kcat
                            pltpu.VMEM((2 * N, 2 * D), q.dtype)],  # vcat
            interpret=interpret,
        )(q, k, v, mask2, cos2, sin2, cos2, sin2, P)
        return out

    out = pl.pallas_call(
        _partial(_vmem_attn_nhd_kernel, sm_scale=1.0 / math.sqrt(D), d_head=D,
                 block_kv=int(block_kv), heads_per_block=group),
        grid=(B, hg, N // bq),
        in_specs=[
            pl.BlockSpec((1, bq, gw), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, gw), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, gw), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, gw), lambda b, h, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, gw), lambda b, h, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, gw), lambda b, h, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, gw), lambda b, h, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gw, gw), lambda b, h, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, gw), lambda b, h, i: (b, i, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, inner), q.dtype),
        scratch_shapes=[pltpu.VMEM((N, gw), q.dtype)],  # roped k, per (b,h)
        interpret=interpret,
    )(q, k, v, maskf, cos2, sin2, cos2, sin2, P)
    return out


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
