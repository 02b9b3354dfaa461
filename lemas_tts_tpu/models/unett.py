"""UNet-Transformer backbone (E2-TTS / voicebox style) in flax.

Alternate CFM backbone with the capabilities of the reference UNetT
(``lemas_tts/model/backbones/unett.py:106-250``): a flat transformer whose
first half pushes activations onto a skip stack and whose second half pops
them back (concat+proj or add), with the time embedding packed as an extra
token at sequence position 0. Pre-norm RMSNorm blocks (no AdaLN).

Shares the hoistable ``embed_text`` contract with DiT/MMDiT so the jitted
sampler drives any backbone.
"""

from __future__ import annotations

from typing import Literal, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lemas_tts_tpu.models.dit import InputEmbedding, TextEmbedding
from lemas_tts_tpu.models.modules import (
    Attention,
    FeedForward,
    RMSNorm,
    TimestepEmbedding,
)
from lemas_tts_tpu.ops.rope import rope_angles


class UNetT(nn.Module):
    dim: int
    depth: int = 8
    heads: int = 8
    dim_head: int = 64
    ff_mult: int = 4
    mel_dim: int = 100
    text_num_embeds: int = 256
    text_dim: Optional[int] = None
    text_mask_padding: bool = True
    qk_norm: Optional[str] = None
    conv_layers: int = 0
    pe_attn_head: Optional[int] = None
    skip_connect_type: Literal["add", "concat", "none"] = "concat"
    attn_backend: str = "xla"
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.depth % 2 == 0, "UNet-Transformer depth must be even"
        text_dim = self.text_dim if self.text_dim is not None else self.mel_dim
        self.time_embed = TimestepEmbedding(self.dim, compute_dtype=self.compute_dtype)
        self.text_embed = TextEmbedding(
            self.text_num_embeds, text_dim, mask_padding=self.text_mask_padding,
            conv_layers=self.conv_layers, compute_dtype=self.compute_dtype,
        )
        self.input_embed = InputEmbedding(self.dim, compute_dtype=self.compute_dtype)

        layers = []
        for idx in range(self.depth):
            is_later_half = idx >= self.depth // 2
            layers.append(
                dict(
                    skip_proj=(
                        nn.Dense(self.dim, use_bias=False,
                                 dtype=self.compute_dtype, name=f"skip_proj_{idx}")
                        if self.skip_connect_type == "concat" and is_later_half
                        else None
                    ),
                    attn_norm=RMSNorm(self.dim, name=f"attn_norm_{idx}"),
                    attn=Attention(
                        self.dim, heads=self.heads, dim_head=self.dim_head,
                        qk_norm=self.qk_norm, pe_attn_head=self.pe_attn_head,
                        attn_backend=self.attn_backend,
                        compute_dtype=self.compute_dtype, name=f"attn_{idx}",
                    ),
                    ff_norm=RMSNorm(self.dim, name=f"ff_norm_{idx}"),
                    ff=FeedForward(self.dim, mult=self.ff_mult,
                                   compute_dtype=self.compute_dtype,
                                   name=f"ff_{idx}"),
                )
            )
        self.layers = layers
        self.norm_out = RMSNorm(self.dim)
        self.proj_out = nn.Dense(self.mel_dim, dtype=self.compute_dtype)

    def embed_text(self, text_ids: jax.Array, seq_len: int,
                   drop_text: bool = False) -> jax.Array:
        return self.text_embed(text_ids, seq_len, drop_text=drop_text)

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
                "UNetT does not support prosody_text conditioning; "
                "use the DiT backbone for prosody models"
            )
        B, N, _ = x.shape
        if time.ndim == 0:
            time = jnp.broadcast_to(time, (B,))
        t_emb = self.time_embed(time)
        if text_embed is None:
            text_embed = self.text_embed(text_ids, N, drop_text=drop_text)
        h = self.input_embed(
            x.astype(self.compute_dtype), cond.astype(self.compute_dtype),
            text_embed, drop_audio_cond=drop_audio_cond,
        )

        # pack time as token 0 (unett.py:224-229)
        h = jnp.concatenate([t_emb[:, None, :].astype(h.dtype), h], axis=1)
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)
        rope = rope_angles(N + 1, self.dim_head)

        skips = []
        for idx, layer in enumerate(self.layers):
            if idx < self.depth // 2:
                skips.append(h)
            else:
                skip = skips.pop()
                if self.skip_connect_type == "concat":
                    h = layer["skip_proj"](jnp.concatenate([h, skip], axis=-1))
                elif self.skip_connect_type == "add":
                    h = h + skip
            h = layer["attn"](layer["attn_norm"](h), mask=mask,
                              rope_angles_arr=rope) + h
            h = layer["ff"](layer["ff_norm"](h)) + h

        h = self.norm_out(h)[:, 1:, :]  # unpack time token
        return self.proj_out(h).astype(jnp.float32)
