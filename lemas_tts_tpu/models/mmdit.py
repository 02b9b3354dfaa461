"""MM-DiT backbone (SD3-style dual-stream text/audio transformer) in flax.

Alternate CFM backbone with the capabilities of the reference MMDiT
(``lemas_tts/model/backbones/mmdit.py:85-189`` + ``JointAttnProcessor``,
``modules.py:510-604``): text and audio streams each get their own QKV
projections and AdaLN modulation, attend jointly over the concatenated
sequence (separate rope per stream), and are split back; the last block is
context-pre-only (no text FFN). The reference's mutable text cache is
replaced by the hoistable ``embed_text`` method (same contract as
:class:`~lemas_tts_tpu.models.dit.DiT`), so the jitted sampler drives either
backbone interchangeably.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lemas_tts_tpu.models.modules import (
    AdaLayerNorm,
    AdaLayerNormFinal,
    ConvPositionEmbedding,
    FeedForward,
    RMSNorm,
    TimestepEmbedding,
)
from lemas_tts_tpu.ops.attention import attention
from lemas_tts_tpu.ops.rope import abs_pos_embedding, apply_rope, rope_angles


class MMTextEmbedding(nn.Module):
    """Token embed + sinus abs-pos, padding masked (``mmdit.py:28-60``)."""

    text_num_embeds: int
    dim: int
    mask_padding: bool = True
    precompute_max_pos: int = 1024
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text_ids: jax.Array, drop_text: bool = False) -> jax.Array:
        ids = text_ids + 1  # -1 pad → 0 filler
        pad_mask = ids == 0
        if drop_text:
            ids = jnp.zeros_like(ids)
        emb = nn.Embed(self.text_num_embeds + 1, self.dim,
                       dtype=self.compute_dtype, name="embed")(ids)
        pos = jnp.asarray(abs_pos_embedding(self.dim, self.precompute_max_pos))
        idx = jnp.minimum(jnp.arange(ids.shape[1]), self.precompute_max_pos - 1)
        emb = emb + pos[idx][None].astype(emb.dtype)
        if self.mask_padding:
            emb = jnp.where(pad_mask[..., None], 0.0, emb)
        return emb


class AudioEmbedding(nn.Module):
    """concat(x, cond) → Dense → +conv pos (``mmdit.py:66-79``)."""

    dim: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, drop_audio_cond: bool = False):
        if drop_audio_cond:
            cond = jnp.zeros_like(cond)
        h = nn.Dense(self.dim, dtype=self.compute_dtype, name="linear")(
            jnp.concatenate([x, cond], axis=-1)
        )
        return ConvPositionEmbedding(
            self.dim, compute_dtype=self.compute_dtype, name="conv_pos"
        )(h) + h


class JointAttention(nn.Module):
    """Dual-stream joint attention (``JointAttnProcessor``,
    ``modules.py:510-604``). Returns (x_out, c_out or None)."""

    dim: int
    heads: int
    dim_head: int
    context_pre_only: bool = False
    qk_norm: Optional[str] = None
    attn_backend: str = "xla"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c, mask=None, rope_x=None, rope_c=None):
        B, N, _ = x.shape
        nt = c.shape[1]
        inner = self.heads * self.dim_head

        def proj(h, name):
            return nn.Dense(inner, dtype=self.compute_dtype, name=name)(h)

        def heads_first(t, L):
            return t.reshape(B, L, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q = heads_first(proj(x, "to_q"), N)
        k = heads_first(proj(x, "to_k"), N)
        v = heads_first(proj(x, "to_v"), N)
        cq = heads_first(proj(c, "to_q_c"), nt)
        ck = heads_first(proj(c, "to_k_c"), nt)
        cv = heads_first(proj(c, "to_v_c"), nt)

        if self.qk_norm == "rms_norm":
            q = RMSNorm(self.dim_head, name="q_norm")(q)
            k = RMSNorm(self.dim_head, name="k_norm")(k)
            cq = RMSNorm(self.dim_head, name="c_q_norm")(cq)
            ck = RMSNorm(self.dim_head, name="c_k_norm")(ck)

        if rope_x is not None:
            q, k = apply_rope(q, rope_x), apply_rope(k, rope_x)
        if rope_c is not None:
            cq, ck = apply_rope(cq, rope_c), apply_rope(ck, rope_c)

        # joint sequence: [audio ; text]
        q = jnp.concatenate([q, cq], axis=2)
        k = jnp.concatenate([k, ck], axis=2)
        v = jnp.concatenate([v, cv], axis=2)
        joint_mask = None
        if mask is not None:  # text positions are never masked (modules.py:577)
            joint_mask = jnp.concatenate(
                [mask, jnp.ones((B, nt), dtype=mask.dtype)], axis=1
            )

        out = attention(q, k, v, mask=joint_mask, backend=self.attn_backend)
        out = out.transpose(0, 2, 1, 3).reshape(B, N + nt, inner)
        x_out, c_out = out[:, :N], out[:, N:]

        x_out = nn.Dense(self.dim, dtype=self.compute_dtype, name="to_out")(x_out)
        if mask is not None:
            x_out = jnp.where(mask[..., None], x_out, 0.0)
        if self.context_pre_only:
            return x_out, None
        c_out = nn.Dense(self.dim, dtype=self.compute_dtype, name="to_out_c")(c_out)
        return x_out, c_out


class MMDiTBlock(nn.Module):
    """Dual-stream AdaLN-zero block (``modules.py:647-715``)."""

    dim: int
    heads: int
    dim_head: int
    ff_mult: int = 4
    context_pre_only: bool = False
    qk_norm: Optional[str] = None
    attn_backend: str = "xla"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c, t_emb, mask=None, rope_x=None, rope_c=None):
        if self.context_pre_only:
            norm_c = AdaLayerNormFinal(self.dim, compute_dtype=self.compute_dtype,
                                       name="attn_norm_c")(c, t_emb)
        else:
            norm_c, c_gate, c_shift, c_scale, c_gate_mlp = AdaLayerNorm(
                self.dim, compute_dtype=self.compute_dtype, name="attn_norm_c"
            )(c, t_emb)
        norm_x, x_gate, x_shift, x_scale, x_gate_mlp = AdaLayerNorm(
            self.dim, compute_dtype=self.compute_dtype, name="attn_norm_x"
        )(x, t_emb)

        x_attn, c_attn = JointAttention(
            self.dim, self.heads, self.dim_head,
            context_pre_only=self.context_pre_only, qk_norm=self.qk_norm,
            attn_backend=self.attn_backend, compute_dtype=self.compute_dtype,
            name="attn",
        )(norm_x, norm_c, mask=mask, rope_x=rope_x, rope_c=rope_c)

        if not self.context_pre_only:
            c = c + c_gate[:, None] * c_attn
            nc = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                              dtype=jnp.float32, name="ff_norm_c")(c).astype(c.dtype)
            nc = nc * (1 + c_scale[:, None]) + c_shift[:, None]
            c = c + c_gate_mlp[:, None] * FeedForward(
                self.dim, mult=self.ff_mult, compute_dtype=self.compute_dtype,
                name="ff_c",
            )(nc)
        else:
            c = None

        x = x + x_gate[:, None] * x_attn
        nx = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                          dtype=jnp.float32, name="ff_norm_x")(x).astype(x.dtype)
        nx = nx * (1 + x_scale[:, None]) + x_shift[:, None]
        x = x + x_gate_mlp[:, None] * FeedForward(
            self.dim, mult=self.ff_mult, compute_dtype=self.compute_dtype,
            name="ff_x",
        )(nx)
        return c, x


class MMDiT(nn.Module):
    """v = MMDiT(x_t, cond, text, t) — alternate CFM backbone."""

    dim: int
    depth: int = 8
    heads: int = 8
    dim_head: int = 64
    ff_mult: int = 4
    mel_dim: int = 100
    text_num_embeds: int = 256
    text_mask_padding: bool = True
    qk_norm: Optional[str] = None
    attn_backend: str = "xla"
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.time_embed = TimestepEmbedding(self.dim, compute_dtype=self.compute_dtype)
        self.text_embed = MMTextEmbedding(
            self.text_num_embeds, self.dim, mask_padding=self.text_mask_padding,
            compute_dtype=self.compute_dtype,
        )
        self.audio_embed = AudioEmbedding(self.dim, compute_dtype=self.compute_dtype)
        self.blocks = [
            MMDiTBlock(
                self.dim, self.heads, self.dim_head, ff_mult=self.ff_mult,
                context_pre_only=(i == self.depth - 1), qk_norm=self.qk_norm,
                attn_backend=self.attn_backend, compute_dtype=self.compute_dtype,
                name=f"block_{i}",
            )
            for i in range(self.depth)
        ]
        self.norm_out = AdaLayerNormFinal(self.dim, compute_dtype=self.compute_dtype)
        self.proj_out = nn.Dense(self.mel_dim, dtype=self.compute_dtype)

    def embed_text(self, text_ids: jax.Array, seq_len: int = 0,
                   drop_text: bool = False) -> jax.Array:
        """Hoistable text path (``seq_len`` unused — text keeps its own length
        in the dual-stream design; kept for sampler-signature compatibility)."""
        return self.text_embed(text_ids, drop_text=drop_text)

    def __call__(
        self,
        x: jax.Array,  # [B, N, mel]
        cond: jax.Array,
        text_ids: Optional[jax.Array],
        time: jax.Array,
        mask: Optional[jax.Array] = None,
        drop_audio_cond: bool = False,
        drop_text: bool = False,
        text_embed: Optional[jax.Array] = None,
        prosody_text: Optional[jax.Array] = None,
    ) -> jax.Array:
        if prosody_text is not None:
            # fail loudly rather than silently dropping the conditioning the
            # caller believes is active (only DiT consumes prosody_text)
            raise NotImplementedError(
                "MMDiT does not support prosody_text conditioning; "
                "use the DiT backbone for prosody models"
            )
        B, N, _ = x.shape
        if time.ndim == 0:
            time = jnp.broadcast_to(time, (B,))
        t_emb = self.time_embed(time)
        c = text_embed if text_embed is not None else self.text_embed(
            text_ids, drop_text=drop_text
        )
        h = self.audio_embed(x.astype(self.compute_dtype),
                             cond.astype(self.compute_dtype),
                             drop_audio_cond=drop_audio_cond)
        rope_x = rope_angles(N, self.dim_head)
        rope_c = rope_angles(c.shape[1], self.dim_head)
        for block in self.blocks:
            c, h = block(h, c, t_emb, mask=mask, rope_x=rope_x, rope_c=rope_c)
        h = self.norm_out(h, t_emb)
        return self.proj_out(h).astype(jnp.float32)
