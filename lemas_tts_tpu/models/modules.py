"""Shared flax building blocks for the CFM backbones.

Numerics mirror the reference module library (``lemas_tts/model/modules.py``)
exactly — same activation variants (erf-GELU in ConvNeXtV2, tanh-GELU in
FeedForward), same AdaLN chunk ordering, GRN normalizing over the *sequence*
axis, periodic rope convention — but are re-designed as stateless flax modules
with a configurable compute dtype (bf16 on TPU; LayerNorm/softmax stay fp32).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lemas_tts_tpu.ops.attention import attention
from lemas_tts_tpu.ops.quant import maybe_quant_dense
from lemas_tts_tpu.ops.rope import apply_rope


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def sinus_position_embedding(x: jax.Array, dim: int, scale: float = 1000.0) -> jax.Array:
    """[B] scalar positions → [B, dim] sin/cos features
    (reference ``SinusPositionEmbedding``, ``modules.py:149-161``)."""
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1))
    )
    args = scale * x.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class TimestepEmbedding(nn.Module):
    """Sinusoidal(256) → Linear → SiLU → Linear (``modules.py:721-731``)."""

    dim: int
    freq_embed_dim: int = 256
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:  # t: [B]
        h = sinus_position_embedding(t, self.freq_embed_dim).astype(self.compute_dtype)
        h = nn.Dense(self.dim, dtype=self.compute_dtype, name="mlp_in")(h)
        h = jax.nn.silu(h)
        return nn.Dense(self.dim, dtype=self.compute_dtype, name="mlp_out")(h)


class GroupedConvTaps(nn.Module):
    """Grouped 1-D SAME conv with a batch-adaptive compute strategy.

    Parameter tree is identical to ``nn.Conv(feature_group_count=groups)``
    (kernel ``[K, Cin/g, Cout]`` + bias), so converted checkpoints load
    unchanged. At small rows (B·N ≤ 3072, the serving B=1 hot path) the conv
    runs as K shifted ``[B,N,g,Cin/g]×[g,Cin/g,Cout/g]`` einsums accumulated
    in fp32 — XLA's grouped-conv lowering is ~6% MXU utilization there and
    the tap form measures 2.3× faster on v5e (443→192 µs at B=2, N=1024,
    D=1024, k=31, g=16). The crossover is *batch*-driven, not row-driven —
    lax grouped conv scales sublinearly with batch (B=2/4/8 at N=1024:
    443/483/581 µs) while taps scale with rows (192/632/1558 µs), yet taps
    still win at B=2 for every N bucket (N=512/1024/2048/4096:
    116/192/635/1557 vs 255/443/836/1665 µs) — so: taps iff batch ≤ 2
    (the CFG-stacked B=1 serving hot path), lax above.
    """

    features: int
    kernel_size: int
    groups: int
    compute_dtype: jnp.dtype = jnp.float32
    tap_batch_threshold: int = 2  # conv batch at/below which taps win (v5e)
    padding: str = "SAME"  # "VALID" for halo-extended sequence shards

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        K, G = self.kernel_size, self.groups
        cin = x.shape[-1] // G
        cout = self.features // G
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (K, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        B, N, _ = x.shape
        n_out = N if self.padding == "SAME" else N - K + 1
        if B > self.tap_batch_threshold:
            out = jax.lax.conv_general_dilated(
                x.astype(self.compute_dtype),
                kernel.astype(self.compute_dtype),
                (1,), self.padding,
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=G,
            )
            return (out + bias).astype(self.compute_dtype)
        w_tap = jnp.transpose(
            kernel.reshape(K, cin, G, cout), (0, 2, 1, 3)
        ).astype(self.compute_dtype)  # [K, G, cin, cout]
        if self.padding == "SAME":
            # padding split must match XLA/flax: floor((K-1)/2) low, ceil high
            xpad = jnp.pad(x.astype(self.compute_dtype),
                           ((0, 0), ((K - 1) // 2, K // 2), (0, 0)))
        else:
            xpad = x.astype(self.compute_dtype)
        xg = xpad.reshape(B, n_out + K - 1, G, cin)
        out = jnp.zeros((B, n_out, G, cout), jnp.float32)
        for t in range(K):
            out = out + jnp.einsum(
                "bngi,gio->bngo", xg[:, t : t + n_out], w_tap[t],
                preferred_element_type=jnp.float32,
            )
        out = out.reshape(B, n_out, self.features) + bias
        return out.astype(self.compute_dtype)


class ConvPositionEmbedding(nn.Module):
    """Two grouped k=31 convs with Mish (``modules.py:167-190``).

    With ``seq_axis`` set (sequence-parallel sampling, ``parallel/sequence``),
    the input is a sequence shard: the chained SAME convs need ``2·(K//2)``
    frames of context per side, fetched once from the ring neighbors
    (``ops/ring_attention.halo_exchange`` — zeros at the global edges, exactly
    the global SAME zero padding), then both convs run VALID on the extended
    shard. Identical math to the unsharded chain, so the same params serve
    both paths.
    """

    dim: int
    kernel_size: int = 31
    groups: int = 16
    compute_dtype: jnp.dtype = jnp.float32
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        # x: [B, N, D]; channel-last.
        if mask is not None:
            x = jnp.where(mask[..., None], x, 0.0)
        padding = "SAME"
        half = self.kernel_size // 2
        if self.seq_axis is not None:
            from lemas_tts_tpu.ops.ring_attention import halo_exchange

            # symmetric halo requires odd K (SAME pads (K-1)//2 low, K//2 high)
            assert self.kernel_size % 2 == 1, self.kernel_size
            nl = x.shape[1]
            x = halo_exchange(x, 2 * half, self.seq_axis)
            padding = "VALID"
        h = GroupedConvTaps(
            self.dim, self.kernel_size, self.groups,
            compute_dtype=self.compute_dtype, padding=padding, name="conv1",
        )(x)
        h = mish(h)
        if self.seq_axis is not None:
            # conv2's SAME pad in the global chain zeroes conv1's POST-mish
            # output outside the sequence — but the VALID chain computed
            # mish(conv1(zero-halo)) = mish(bias) ≠ 0 there. Zero the rows
            # whose global center falls outside [0, N_global).
            idx = jax.lax.axis_index(self.seq_axis)
            n_global = nl * jax.lax.axis_size(self.seq_axis)
            centers = jnp.arange(h.shape[1]) - half + idx * nl
            inside = (centers >= 0) & (centers < n_global)
            h = jnp.where(inside[None, :, None], h, 0.0)
        h = GroupedConvTaps(
            self.dim, self.kernel_size, self.groups,
            compute_dtype=self.compute_dtype, padding=padding, name="conv2",
        )(h)
        h = mish(h)
        if mask is not None:
            h = jnp.where(mask[..., None], h, 0.0)
        return h


class GRN(nn.Module):
    """Global response norm over the sequence axis (``modules.py:225-234``)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, self.dim))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, self.dim))
        gx = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=1, keepdims=True))
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return (gamma * (x * nx.astype(x.dtype)) + beta + x).astype(x.dtype)


class ConvNeXtV2Block(nn.Module):
    """Depthwise k=7 conv → LN → pw expand → GELU(erf) → GRN → pw back, residual
    (``modules.py:241-269``)."""

    dim: int
    intermediate_dim: int
    dilation: int = 1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        pad = self.dilation * 3
        h = nn.Conv(
            self.dim,
            (7,),
            padding=[(pad, pad)],
            feature_group_count=self.dim,
            kernel_dilation=(self.dilation,),
            dtype=self.compute_dtype,
            name="dwconv",
        )(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(h).astype(
            self.compute_dtype
        )
        h = nn.Dense(self.intermediate_dim, dtype=self.compute_dtype, name="pwconv1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = GRN(self.intermediate_dim, name="grn")(h)
        h = nn.Dense(self.dim, dtype=self.compute_dtype, name="pwconv2")(h)
        return residual + h


class RMSNorm(nn.Module):
    """Per-head qk RMSNorm option (``modules.py:275-294``)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (y * weight).astype(x.dtype)


class _DenseParams(nn.Module):
    """Declares an ``nn.Dense``-identical param tree (kernel+bias) without
    running the dense — lets a fused Pallas kernel consume the raw weights
    while converted checkpoints keep loading unchanged."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class FeedForward(nn.Module):
    """Linear → GELU(tanh) → Dropout → Linear (``modules.py:342-353``;
    dropout active only under ``deterministic=False`` — the trainer's path).

    ``fused_mod=(scale, shift, gate)`` switches to the fused Pallas FF-block
    kernel (ops/ffn.py): ``x`` is then the *raw* post-attention residual
    stream and the return value is the complete block tail
    ``x + gate·FF(LN(x)·(1+scale)+shift)`` (reference ``modules.py:633-640``).
    """

    dim: int
    mult: int = 4
    dropout: float = 0.0
    quant: Optional[str] = None  # None | "int8" (ops/quant.py W8A8 serving path)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        fused_mod: Optional[tuple] = None,
    ) -> jax.Array:
        inner = int(self.dim * self.mult)
        if fused_mod is not None:
            from lemas_tts_tpu.ops.ffn import ffn_block

            w1, b1 = _DenseParams(self.dim, inner, name="in_proj")()
            w2, b2 = _DenseParams(inner, self.dim, name="out_proj")()
            scale, shift, gate = fused_mod
            return ffn_block(x, scale, shift, gate, w1, b1, w2, b2)
        h = maybe_quant_dense(
            inner, quant=self.quant, dtype=self.compute_dtype, name="in_proj"
        )(x)
        h = jax.nn.gelu(h, approximate=True)
        h = nn.Dropout(self.dropout, name="drop")(h, deterministic=deterministic)
        return maybe_quant_dense(
            self.dim, quant=self.quant, dtype=self.compute_dtype, name="out_proj"
        )(h)


class Attention(nn.Module):
    """Multi-head self-attention with rope; same projection layout as the
    reference ``Attention``+``AttnProcessor`` (``modules.py:360-503``)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    qk_norm: Optional[str] = None
    pe_attn_head: Optional[int] = None  # rope on first k heads only, None = all
    attn_backend: str = "xla"
    dropout: float = 0.0
    quant: Optional[str] = None  # None | "int8" (ops/quant.py W8A8 serving path)
    compute_dtype: jnp.dtype = jnp.float32
    # sequence-parallel mesh axis (parallel/sequence): x/mask are sequence
    # shards, rope_angles_arr carries global positions, attention runs the
    # ring schedule (ops/ring_attention) instead of a local backend
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, N, D]
        mask: Optional[jax.Array] = None,  # [B, N] key-padding, True = keep
        rope_angles_arr: Optional[jax.Array] = None,  # [N, dim_head//2]
        deterministic: bool = True,
        fused_ln_mod: Optional[tuple] = None,  # (scale_msa, shift_msa)
    ) -> jax.Array:
        B, N, _ = x.shape
        inner = self.heads * self.dim_head

        def dense(features, name):
            return maybe_quant_dense(
                features, quant=self.quant, dtype=self.compute_dtype, name=name
            )

        if fused_ln_mod is not None:
            # x is the *raw* residual stream: the qkv_block kernel computes
            # LN + AdaLN modulation + all three projections in one pass
            # (caller guarantees the nhd/qkv kernel preconditions)
            from lemas_tts_tpu.ops.attention import vmem_attention_nhd
            from lemas_tts_tpu.ops.ffn import qkv_block

            scale, shift = fused_ln_mod
            wq, bq = _DenseParams(self.dim, inner, name="to_q")()
            wk, bk = _DenseParams(self.dim, inner, name="to_k")()
            wv, bv = _DenseParams(self.dim, inner, name="to_v")()
            q, k, v = qkv_block(x, scale, shift, wq, bq, wk, bk, wv, bv)
            import os as _os

            out = vmem_attention_nhd(
                q, k, v, mask, rope_angles_arr, heads=self.heads,
                # probe-only e2e switch for the head-pair-packed variant
                # (ops/attention.py pack_pair docstring); never a default
                pack_pair=_os.environ.get("LEMAS_ATTN_PACK", "") == "1")
        else:
            # qkv share input x; under int8 XLA CSEs per-token quantization.
            q = dense(inner, "to_q")(x)
            k = dense(inner, "to_k")(x)
            v = dense(inner, "to_v")(x)

            # flat-layout fused path: no head-split transposes around the
            # kernel (they pin an N-minor layout on the DiT scan carry — see
            # docs/performance.md), rope applied in-kernel
            from lemas_tts_tpu.ops.attention import nhd_supported

            use_nhd = (
                self.seq_axis is None
                and self.attn_backend == "vmem"
                and nhd_supported(
                    self.heads, self.dim_head, N, self.qk_norm,
                    self.pe_attn_head, rope_angles_arr is not None,
                )
            )
            if use_nhd:
                from lemas_tts_tpu.ops.attention import vmem_attention_nhd

                out = vmem_attention_nhd(q, k, v, mask, rope_angles_arr,
                                         heads=self.heads)
            else:
                def split_heads(t):
                    return t.reshape(
                        B, N, self.heads, self.dim_head).transpose(0, 2, 1, 3)

                q, k, v = split_heads(q), split_heads(k), split_heads(v)

                if self.qk_norm == "rms_norm":
                    q = RMSNorm(self.dim_head, name="q_norm")(q)
                    k = RMSNorm(self.dim_head, name="k_norm")(k)

                if rope_angles_arr is not None:
                    if self.pe_attn_head is not None:
                        pn = self.pe_attn_head
                        q = jnp.concatenate(
                            [apply_rope(q[:, :pn], rope_angles_arr),
                             q[:, pn:]],
                            axis=1,
                        )
                        k = jnp.concatenate(
                            [apply_rope(k[:, :pn], rope_angles_arr),
                             k[:, pn:]],
                            axis=1,
                        )
                    else:
                        q = apply_rope(q, rope_angles_arr)
                        k = apply_rope(k, rope_angles_arr)

                if self.seq_axis is not None:
                    from lemas_tts_tpu.ops.ring_attention import ring_attention

                    out = ring_attention(q, k, v, mask, self.seq_axis)
                else:
                    out = attention(q, k, v, mask=mask,
                                    backend=self.attn_backend)
                out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        out = dense(self.dim, "to_out")(out)
        # reference to_out = [Linear, Dropout] (modules.py:412-414)
        out = nn.Dropout(self.dropout, name="drop")(out, deterministic=deterministic)
        if mask is not None:
            out = jnp.where(mask[..., None], out, 0.0)  # zero padded queries
        return out


class AdaLayerNorm(nn.Module):
    """AdaLN-zero producing 6 modulation chunks in the reference order
    shift/scale/gate (msa) + shift/scale/gate (mlp) (``modules.py:301-315``)."""

    dim: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array, return_raw: bool = False):
        mod = nn.Dense(self.dim * 6, dtype=self.compute_dtype, name="mod")(
            jax.nn.silu(emb)
        )
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
            mod, 6, axis=-1
        )
        if return_raw:  # fused-kernel path computes LN+modulation itself
            return (shift_msa, scale_msa, gate_msa,
                    shift_mlp, scale_mlp, gate_mlp)
        normed = nn.LayerNorm(
            epsilon=1e-6, use_bias=False, use_scale=False, dtype=jnp.float32, name="norm"
        )(x).astype(x.dtype)
        out = normed * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return out, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormFinal(nn.Module):
    """Final AdaLN: 2 chunks in *scale-then-shift* order (``modules.py:322-336``)."""

    dim: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array) -> jax.Array:
        mod = nn.Dense(self.dim * 2, dtype=self.compute_dtype, name="mod")(
            jax.nn.silu(emb)
        )
        scale, shift = jnp.split(mod, 2, axis=-1)
        normed = nn.LayerNorm(
            epsilon=1e-6, use_bias=False, use_scale=False, dtype=jnp.float32, name="norm"
        )(x).astype(x.dtype)
        return normed * (1 + scale[:, None]) + shift[:, None]


class DiTBlock(nn.Module):
    """AdaLN → attention → gate, LN-mod → FF → gate (``modules.py:610-641``)."""

    dim: int
    heads: int
    dim_head: int
    ff_mult: int = 4
    qk_norm: Optional[str] = None
    pe_attn_head: Optional[int] = None
    attn_backend: str = "xla"
    dropout: float = 0.0
    quant: Optional[str] = None
    compute_dtype: jnp.dtype = jnp.float32
    seq_axis: Optional[str] = None  # sequence-parallel mesh axis

    @nn.compact
    def __call__(self, x, t_emb, mask=None, rope_angles_arr=None,
                 deterministic: bool = True):
        from lemas_tts_tpu.ops.attention import nhd_supported
        from lemas_tts_tpu.ops.ffn import qkv_block_supported

        # hybrid resolution: "int8" quantizes all block matmuls (loses the
        # fused qkv/ffn kernels — the attention kernel itself still runs);
        # "int8_ff" quantizes ONLY the FeedForward matmuls (~2/3 of block
        # weights) so the attention-side fused Pallas path stays live
        if self.quant not in (None, "int8", "int8_ff"):
            raise ValueError(f"unknown quantization mode: {self.quant!r}")
        attn_quant = "int8" if self.quant == "int8" else None
        ff_quant = "int8" if self.quant in ("int8", "int8_ff") else None

        ada = AdaLayerNorm(
            self.dim, compute_dtype=self.compute_dtype, name="attn_norm"
        )
        attn = Attention(
            self.dim,
            heads=self.heads,
            dim_head=self.dim_head,
            qk_norm=self.qk_norm,
            pe_attn_head=self.pe_attn_head,
            attn_backend=self.attn_backend,
            dropout=self.dropout,
            quant=attn_quant,
            compute_dtype=self.compute_dtype,
            seq_axis=self.seq_axis,
            name="attn",
        )
        # fused TPU inference path (ops/ffn.py qkv_block + nhd attention):
        # nhd kernel preconditions (shared predicate) plus VMEM-resident
        # weights in the compute dtype
        itemsize = jnp.dtype(self.compute_dtype).itemsize
        fused_attn = (
            self.seq_axis is None
            and self.attn_backend == "vmem"
            and attn_quant is None
            and deterministic
            and nhd_supported(
                self.heads, self.dim_head, x.shape[1], self.qk_norm,
                self.pe_attn_head, rope_angles_arr is not None,
            )
            and qkv_block_supported(
                x.shape[1], self.dim, self.heads * self.dim_head, itemsize
            )
        )
        if fused_attn:
            (shift_msa, scale_msa, gate_msa,
             shift_mlp, scale_mlp, gate_mlp) = ada(x, t_emb, return_raw=True)
            attn_out = attn(
                x, mask=mask, rope_angles_arr=rope_angles_arr,
                deterministic=deterministic,
                fused_ln_mod=(scale_msa, shift_msa),
            )
        else:
            norm, gate_msa, shift_mlp, scale_mlp, gate_mlp = ada(x, t_emb)
            attn_out = attn(norm, mask=mask, rope_angles_arr=rope_angles_arr,
                            deterministic=deterministic)
        x = x + gate_msa[:, None] * attn_out

        from lemas_tts_tpu.ops.ffn import ffn_block_supported

        ff = FeedForward(
            self.dim, mult=self.ff_mult, dropout=self.dropout, quant=ff_quant,
            compute_dtype=self.compute_dtype, name="ff"
        )
        # fused Pallas FF-block on the TPU inference path: pins the scan-carry
        # layout at {2,1,0} and runs the whole LN→mod→FF→gate tail at matmul
        # speed (ops/ffn.py; docs/performance.md)
        if (
            self.attn_backend == "vmem"
            and ff_quant is None
            and deterministic
            and ffn_block_supported(
                x.shape[1], self.dim, int(self.dim * self.ff_mult),
                jnp.dtype(self.compute_dtype).itemsize,
            )
        ):
            return ff(x, deterministic,
                      fused_mod=(scale_mlp, shift_mlp, gate_mlp))

        normed = nn.LayerNorm(
            epsilon=1e-6, use_bias=False, use_scale=False, dtype=jnp.float32, name="ff_norm"
        )(x).astype(x.dtype)
        normed = normed * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        ff_out = ff(normed, deterministic=deterministic)
        return x + gate_mlp[:, None] * ff_out
