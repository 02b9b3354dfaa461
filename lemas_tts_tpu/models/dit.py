"""DiT backbone (flax) — the flagship CFM transformer.

Re-design of the reference DiT (``lemas_tts/model/backbones/dit.py:105-254``)
for XLA: the 22 identical blocks run under ``nn.scan`` (one traced block,
stacked params → fast compiles, optional remat), text embedding is a separate
pure method so the sampler hoists it out of the ODE loop (replacing the
mutable text cache at ``dit.py:140,213-222``), and all drop/CFG switches are
static Python booleans so each variant is its own fused XLA program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lemas_tts_tpu.config import DiTArch
from lemas_tts_tpu.models.modules import (
    ConvNeXtV2Block,
    ConvPositionEmbedding,
    DiTBlock,
    AdaLayerNormFinal,
    TimestepEmbedding,
)
from lemas_tts_tpu.ops.rope import abs_pos_embedding, rope_angles


class TextEmbedding(nn.Module):
    """Token embed + absolute sinus pos + masked ConvNeXtV2 stack
    (``dit.py:34-81``). ids are -1-padded; +1 shift maps padding to the
    filler token 0."""

    text_num_embeds: int
    text_dim: int
    mask_padding: bool = True
    conv_layers: int = 4
    conv_mult: int = 2
    precompute_max_pos: int = 4096
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text_ids: jax.Array, seq_len: int, drop_text: bool = False):
        B, nt = text_ids.shape
        ids = text_ids + 1
        ids = ids[:, :seq_len]
        if ids.shape[1] < seq_len:
            ids = jnp.pad(ids, ((0, 0), (0, seq_len - ids.shape[1])))
        pad_mask = ids == 0  # True at filler/batch-pad positions
        if drop_text:
            ids = jnp.zeros_like(ids)

        emb = nn.Embed(
            self.text_num_embeds + 1,
            self.text_dim,
            dtype=self.compute_dtype,
            name="embed",
        )(ids)

        if self.conv_layers > 0:
            pos_table = jnp.asarray(
                abs_pos_embedding(self.text_dim, self.precompute_max_pos)
            )
            pos_idx = jnp.minimum(
                jnp.arange(seq_len), self.precompute_max_pos - 1
            )
            emb = emb + pos_table[pos_idx][None].astype(emb.dtype)
            for i in range(self.conv_layers):
                if self.mask_padding:
                    emb = jnp.where(pad_mask[..., None], 0.0, emb)
                emb = ConvNeXtV2Block(
                    self.text_dim,
                    self.text_dim * self.conv_mult,
                    compute_dtype=self.compute_dtype,
                    name=f"block_{i}",
                )(emb)
            if self.mask_padding:
                emb = jnp.where(pad_mask[..., None], 0.0, emb)
        return emb


class InputEmbedding(nn.Module):
    """concat(noised x, cond mel, text emb) → proj → +conv pos embed
    (``dit.py:87-99``)."""

    out_dim: int
    compute_dtype: jnp.dtype = jnp.float32
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, cond, text_embed, drop_audio_cond: bool = False):
        if drop_audio_cond:
            cond = jnp.zeros_like(cond)
        h = nn.Dense(self.out_dim, dtype=self.compute_dtype, name="proj")(
            jnp.concatenate([x, cond, text_embed], axis=-1)
        )
        return ConvPositionEmbedding(
            self.out_dim, compute_dtype=self.compute_dtype,
            seq_axis=self.seq_axis, name="conv_pos"
        )(h) + h


class _ScanBlock(nn.Module):
    """nn.scan carrier over identical DiT blocks (stacked params along axis 0)."""

    arch: DiTArch
    attn_backend: str
    compute_dtype: jnp.dtype
    quant: Optional[str] = None
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, t_emb, mask, rope, deterministic=True):
        x = DiTBlock(
            dim=self.arch.dim,
            heads=self.arch.heads,
            dim_head=self.arch.dim_head,
            ff_mult=self.arch.ff_mult,
            qk_norm=self.arch.qk_norm,
            pe_attn_head=self.arch.pe_attn_head,
            attn_backend=self.attn_backend,
            dropout=self.arch.dropout,
            quant=self.quant,
            compute_dtype=self.compute_dtype,
            seq_axis=self.seq_axis,
            name="block",
        )(x, t_emb, mask=mask, rope_angles_arr=rope,
          deterministic=deterministic)
        return x, None


def make_block_stack(model: "DiT", length: int):
    """A standalone nn.scan block stack matching ``model``'s own scan config,
    for applying a *slice* of the stacked block params outside the module —
    used by the pipeline-parallel executor (``parallel/pipeline.py``, one
    stage's blocks) and the sampler's block-range cache
    (``cfm/sampler.py:make_cached_forward``). Apply with
    ``{"params": sliced_stacked_blocks}``."""
    block_cls = _ScanBlock
    if model.arch.checkpoint_activations:
        # arg 5 of flax's core_fn (scope, x, t_emb, mask, rope, deterministic)
        # is the Python-bool dropout switch — must stay static under remat
        block_cls = nn.remat(block_cls, static_argnums=(5,))
    return nn.scan(
        block_cls,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
        length=length,
        unroll=model.scan_unroll,
    )(arch=model.arch, attn_backend=model.attn_backend,
      compute_dtype=model.compute_dtype, quant=model.quant,
      seq_axis=model.seq_axis)


class DiT(nn.Module):
    """CFM velocity transformer: v = DiT(x_t, cond, text, t)."""

    arch: DiTArch
    mel_dim: int = 100
    text_num_embeds: int = 256
    use_prosody_encoder: bool = False
    attn_backend: str = "xla"
    compute_dtype: jnp.dtype = jnp.float32
    scan_unroll: int = 1  # lax.scan unroll over blocks (perf knob)
    # None | "int8": W8A8 block matmuls (ops/quant.py). Serving-only: params
    # must come from quantize_dense_tree() over a float checkpoint.
    quant: Optional[str] = None
    # Sequence-parallel mesh axis (parallel/sequence): __call__ then runs on
    # sequence SHARDS inside shard_map — ring attention, halo convs, rope at
    # global positions. Same params as the unsharded model. text_embed must
    # be precomputed globally and passed in sharded (TextEmbedding's ConvNeXt
    # stack spans the full sequence).
    seq_axis: Optional[str] = None

    def setup(self):
        a = self.arch
        text_dim = a.text_dim if a.text_dim is not None else self.mel_dim
        self.time_embed = TimestepEmbedding(a.dim, compute_dtype=self.compute_dtype)
        self.text_embed = TextEmbedding(
            self.text_num_embeds,
            text_dim,
            mask_padding=a.text_mask_padding,
            conv_layers=a.conv_layers,
            conv_mult=a.conv_mult,
            compute_dtype=self.compute_dtype,
        )
        if self.use_prosody_encoder:
            self.prosody_text_proj = nn.Dense(text_dim, dtype=self.compute_dtype)
        self.input_embed = InputEmbedding(a.dim, compute_dtype=self.compute_dtype,
                                          seq_axis=self.seq_axis)

        block_cls = _ScanBlock
        if a.checkpoint_activations:
            # see make_block_stack: deterministic (core_fn arg 5) is static
            block_cls = nn.remat(block_cls, static_argnums=(5,))
        self.blocks = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
            length=a.depth,
            unroll=self.scan_unroll,
        )(arch=a, attn_backend=self.attn_backend,
          compute_dtype=self.compute_dtype, quant=self.quant,
          seq_axis=self.seq_axis)

        if a.long_skip_connection:
            self.long_skip = nn.Dense(a.dim, use_bias=False, dtype=self.compute_dtype)
        self.norm_out = AdaLayerNormFinal(a.dim, compute_dtype=self.compute_dtype)
        self.proj_out = nn.Dense(self.mel_dim, dtype=self.compute_dtype)

    def embed_text(self, text_ids: jax.Array, seq_len: int, drop_text: bool = False):
        """Standalone text-embedding path — computed once per utterance and
        reused across all ODE steps (design note in module docstring)."""
        return self.text_embed(text_ids, seq_len, drop_text=drop_text)

    def embed_inputs(
        self,
        x: jax.Array,
        cond: jax.Array,
        text_ids: Optional[jax.Array],
        time: jax.Array,
        mask: Optional[jax.Array] = None,
        drop_audio_cond: bool = False,
        drop_text: bool = False,
        text_embed: Optional[jax.Array] = None,
        prosody_text: Optional[jax.Array] = None,
    ):
        """Everything of ``__call__`` up to (not including) the block stack:
        returns ``(h, t_emb, rope)``. Split out so the pipeline-parallel
        executor (``parallel/pipeline.py``) can run the embed replicated per
        stage and drive the blocks itself."""
        B, N, _ = x.shape
        if time.ndim == 0:
            time = jnp.broadcast_to(time, (B,))
        t_emb = self.time_embed(time)

        if text_embed is None:
            if self.seq_axis is not None:
                raise ValueError(
                    "seq_axis is set: text_embed must be precomputed on the "
                    "full sequence (embed_text) and passed in sharded"
                )
            text_embed = self.text_embed(text_ids, N, drop_text=drop_text)

        if prosody_text is not None and self.use_prosody_encoder:
            pt = self.prosody_text_proj(prosody_text.astype(self.compute_dtype))
            if pt.shape[1] < N:
                pt = jnp.pad(pt, ((0, 0), (0, N - pt.shape[1]), (0, 0)))
            else:
                pt = pt[:, :N]
            text_embed = text_embed + pt

        h = self.input_embed(
            x.astype(self.compute_dtype),
            cond.astype(self.compute_dtype),
            text_embed,
            drop_audio_cond=drop_audio_cond,
        )

        if self.seq_axis is not None:
            # rope rows for THIS shard's global positions: build the global
            # table (axis size is static) and slice at the shard offset
            table = rope_angles(N * jax.lax.axis_size(self.seq_axis),
                                self.arch.dim_head)
            rope = jax.lax.dynamic_slice_in_dim(
                table, jax.lax.axis_index(self.seq_axis) * N, N
            )
        else:
            rope = rope_angles(N, self.arch.dim_head)
        return h, t_emb, rope

    def head(self, h: jax.Array, residual: Optional[jax.Array],
             t_emb: jax.Array) -> jax.Array:
        """Post-block output path: optional long-skip, final AdaLN, mel
        projection (the tail of ``__call__``)."""
        if self.arch.long_skip_connection:
            h = self.long_skip(jnp.concatenate([h, residual], axis=-1))
        h = self.norm_out(h, t_emb)
        return self.proj_out(h).astype(jnp.float32)

    def __call__(
        self,
        x: jax.Array,  # [B, N, mel_dim] noised input
        cond: jax.Array,  # [B, N, mel_dim] masked cond mel
        text_ids: Optional[jax.Array],  # [B, nt] (-1 padded), or None
        time: jax.Array,  # [B] or scalar
        mask: Optional[jax.Array] = None,  # [B, N]
        drop_audio_cond: bool = False,
        drop_text: bool = False,
        text_embed: Optional[jax.Array] = None,  # precomputed [B, N, text_dim]
        prosody_text: Optional[jax.Array] = None,  # [B, T_text, 512]
        deterministic: bool = True,  # False = training (arch.dropout active)
    ) -> jax.Array:
        h, t_emb, rope = self.embed_inputs(
            x, cond, text_ids, time, mask=mask,
            drop_audio_cond=drop_audio_cond, drop_text=drop_text,
            text_embed=text_embed, prosody_text=prosody_text,
        )
        residual = h if self.arch.long_skip_connection else None
        h, _ = self.blocks(h, t_emb, mask, rope, deterministic)
        return self.head(h, residual, t_emb)
