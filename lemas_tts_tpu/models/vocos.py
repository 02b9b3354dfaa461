"""Vocos mel vocoder in JAX (ConvNeXt backbone + iSTFT head).

The reference loads the pretrained ``charactr/vocos-mel-24khz`` PyTorch model
(``utils_infer.py:120-143``) and calls ``vocoder.decode(mel)``
(``utils_infer.py:549``). This is a from-scratch flax implementation of that
architecture — embed Conv1d(k=7) → LayerNorm → 8× ConvNeXt-v1 blocks
(layer-scale gamma) → LayerNorm → Linear(dim → n_fft+2) → exp-magnitude /
phase split → iSTFT — so decoding is a single fused XLA program (convs on the
MXU, iSTFT as overlap-add scatter; see ``ops/stft.istft``). Weights convert
from the published ``pytorch_model.bin`` via :func:`convert_vocos`.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lemas_tts_tpu.ops.stft import hann_window, istft


class VocosConvNeXtBlock(nn.Module):
    """ConvNeXt-v1 block: dwconv k=7 → LN → pw(dim→inter) → GELU → pw back →
    layer-scale gamma, residual. (No GRN — that's the V2 variant used in the
    DiT text embedding.)"""

    dim: int
    intermediate_dim: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, C]
        residual = x
        h = nn.Conv(
            self.dim, (7,), padding=[(3, 3)], feature_group_count=self.dim,
            dtype=self.compute_dtype, name="dwconv",
        )(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(h).astype(
            self.compute_dtype
        )
        h = nn.Dense(self.intermediate_dim, dtype=self.compute_dtype, name="pwconv1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.compute_dtype, name="pwconv2")(h)
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        return residual + gamma * h


class VocosBackbone(nn.Module):
    input_channels: int = 100
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jax.Array, frame_mask: jax.Array | None = None) -> jax.Array:
        # mel: [B, n_mels, T]; frame_mask: [B, T] marks valid frames. Masking
        # after every conv block makes a zero-padded batch decode equal to an
        # exact-length decode (convs then see zeros beyond the boundary,
        # exactly like torch's SAME zero padding at a true sequence end).
        def m(x):
            return x if frame_mask is None else jnp.where(frame_mask[..., None], x, 0.0)

        x = m(jnp.swapaxes(mel, -1, -2).astype(self.compute_dtype))  # [B, T, n_mels]
        x = nn.Conv(self.dim, (7,), padding=[(3, 3)], dtype=self.compute_dtype,
                    name="embed")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x).astype(
            self.compute_dtype
        )
        for i in range(self.num_layers):
            x = VocosConvNeXtBlock(
                self.dim, self.intermediate_dim, compute_dtype=self.compute_dtype,
                name=f"convnext_{i}",
            )(m(x))
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="final_layer_norm")(m(x))
        return x.astype(self.compute_dtype)


class Vocos(nn.Module):
    """Full vocoder; ``decode``: [B, n_mels, T] log-mel → [B, (T-1)*hop] wave."""

    input_channels: int = 100
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = 256
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = VocosBackbone(
            input_channels=self.input_channels,
            dim=self.dim,
            intermediate_dim=self.intermediate_dim,
            num_layers=self.num_layers,
            compute_dtype=self.compute_dtype,
        )
        self.out = nn.Dense(self.n_fft + 2, dtype=self.compute_dtype)

    def __call__(self, mel: jax.Array, frame_mask: jax.Array | None = None) -> jax.Array:
        return self.decode(mel, frame_mask)

    def decode(self, mel: jax.Array, frame_mask: jax.Array | None = None) -> jax.Array:
        """[B, n_mels, T] log-mel → [B, (T-1)*hop] wave. With ``frame_mask``
        (valid frames per sample), a zero-padded batch decode is bit-equal to
        per-sample exact-length decodes — the TPU replacement for the
        reference's dynamic per-chunk shapes."""
        h = self.backbone(mel, frame_mask)
        h = self.out(h).astype(jnp.float32)  # [B, T, n_fft+2]
        h = jnp.swapaxes(h, -1, -2)  # [B, n_fft+2, T]
        n_bins = self.n_fft // 2 + 1
        # safeguard order matches Vocos' ISTFTHead: clip AFTER exp (caps the
        # magnitude at 1e2, not at e^100)
        mag = jnp.clip(jnp.exp(h[:, :n_bins]), max=1e2)
        phase = h[:, n_bins:]
        spec = mag * jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
        if frame_mask is not None:
            spec = jnp.where(frame_mask[:, None, :], spec, 0.0)
        return istft(
            spec, self.n_fft, self.hop_length,
            window=hann_window(self.n_fft), center=True, frame_mask=frame_mask,
        )


def convert_vocos(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """charactr/vocos ``pytorch_model.bin`` state dict → flax params."""

    def lin(p):
        return {"kernel": np.asarray(sd[f"{p}.weight"]).T, "bias": np.asarray(sd[f"{p}.bias"])}

    def conv(p):
        return {
            "kernel": np.transpose(np.asarray(sd[f"{p}.weight"]), (2, 1, 0)),
            "bias": np.asarray(sd[f"{p}.bias"]),
        }

    def ln(p):
        return {"scale": np.asarray(sd[f"{p}.weight"]), "bias": np.asarray(sd[f"{p}.bias"])}

    bb: Dict[str, Any] = {
        "embed": conv("backbone.embed"),
        "norm": ln("backbone.norm"),
        "final_layer_norm": ln("backbone.final_layer_norm"),
    }
    i = 0
    while f"backbone.convnext.{i}.dwconv.weight" in sd:
        blk = {
            "dwconv": conv(f"backbone.convnext.{i}.dwconv"),
            "norm": ln(f"backbone.convnext.{i}.norm"),
            "pwconv1": lin(f"backbone.convnext.{i}.pwconv1"),
            "pwconv2": lin(f"backbone.convnext.{i}.pwconv2"),
            "gamma": np.asarray(sd[f"backbone.convnext.{i}.gamma"]),
        }
        bb[f"convnext_{i}"] = blk
        i += 1
    return {"backbone": bb, "out": lin("head.out")}
