"""MDX-Net separation / denoising engine.

Byte-matches the reference pipeline (``uvr5/multiprocess_cuda_infer.py:181-335``):
4-channel real-STFT packing (symmetric hann, center=True), DC-bin zeroing,
chunk-slide demixing with edge trim and overlap concat, optional denoise
sign-flip averaging, match-mix passthrough and background stem. The ONNX
Runtime session is replaced by one jitted JAX forward of
:class:`~lemas_tts_tpu.uvr5.mdxnet.ConvTDFNet`; chunk batches run as a single
device call.
"""

from __future__ import annotations

import time
import warnings
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lemas_tts_tpu.ops.resample import resample
from lemas_tts_tpu.ops.stft import istft, stft
from lemas_tts_tpu.uvr5.mdxnet import (
    ConvTDFNet,
    MDXConfig,
    convert_convtdfnet,
    infer_config_from_state_dict,
)

MDX_SAMPLE_RATE = 44100


def hann_symmetric(n: int) -> jnp.ndarray:
    """torch.hann_window(periodic=False) (``multiprocess_cuda_infer.py:199``)."""
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / (n - 1)))
    return jnp.asarray(w, jnp.float32)


class MDXSeparator:
    """One MDX model + its jitted spectrogram→spectrogram program."""

    def __init__(
        self,
        cfg: MDXConfig,
        params: Any,
        *,
        is_denoise: bool = True,
        compensate: float = 1.035,
        # default: 4 when denoising (the sign-flip pair doubles the network
        # batch, and B=16 U-Net programs crash the TPU compiler), 8 for the
        # plain single-apply separation path
        batch_size: Optional[int] = None,
        adjust: float = 1.0,
        mesh: Optional[Any] = None,
    ):
        self.cfg = cfg
        self.model = ConvTDFNet(cfg=cfg)
        self.params = params
        self.is_denoise = is_denoise
        self.compensate = compensate
        self.adjust = adjust
        if batch_size is None:
            batch_size = 4 if is_denoise else 8

        # Data-parallel chunk batches: shard the batch axis over the mesh's
        # 'data' axis (GSPMD; replaces the reference's per-GPU ProcessPool,
        # ``multiprocess_cuda_infer.py:404-433``). Batch is rounded up so every
        # device gets equal rows; padded rows are trimmed after the istft.
        self._in_sharding = None
        if mesh is not None and not mesh.empty:
            from jax.sharding import NamedSharding, PartitionSpec

            dp = mesh.shape.get("data", 1)
            if dp > 1:
                batch_size = -(-batch_size // dp) * dp
                self._in_sharding = NamedSharding(mesh, PartitionSpec("data"))
        self.batch_size = batch_size

        self.trim = cfg.n_fft // 2
        self.chunk_size = cfg.hop * (cfg.dim_t - 1)
        self.gen_size = self.chunk_size - 2 * self.trim
        self._window = hann_symmetric(cfg.n_fft)
        self._run = jax.jit(self._spec_to_spec)

    # ------------------------------------------------------------ model load
    @classmethod
    def from_file(cls, path: str, **kw) -> "MDXSeparator":
        """Load from .onnx (initializer parse) or torch .ckpt/.pt."""
        p = Path(path)
        if p.suffix == ".onnx":
            from lemas_tts_tpu.uvr5.onnx_weights import load_onnx_initializers

            sd = load_onnx_initializers(str(p))
        else:
            from lemas_tts_tpu.infer.checkpoints import load_state_dict

            sd = load_state_dict(str(p))
            sd = {k[len("model."):] if k.startswith("model.") else k: v
                  for k, v in sd.items()}
        cfg = infer_config_from_state_dict(sd)
        params = {"params": convert_convtdfnet(sd, cfg)}
        return cls(cfg, params, **kw)

    @classmethod
    def random_init(cls, cfg: Optional[MDXConfig] = None, **kw) -> "MDXSeparator":
        cfg = cfg or MDXConfig()
        model = ConvTDFNet(cfg=cfg)
        params = model.init(
            jax.random.key(0), jnp.zeros((1, cfg.dim_t, cfg.dim_f, cfg.dim_c))
        )
        return cls(cfg, params, **kw)

    # ------------------------------------------------------- spectral packing
    def pack_stft(self, x: jax.Array) -> jax.Array:
        """[B, 2, chunk] stereo → [B, dim_t, dim_f, 4] packed real spec
        (reference ``stft``, ``:206-212``: [L_re, L_im, R_re, R_im])."""
        B = x.shape[0]
        c = self.cfg
        spec = stft(x.reshape(-1, self.chunk_size), c.n_fft, c.hop,
                    window=self._window, center=True)  # [2B, n_bins, T]
        spec = spec[..., : c.dim_t]
        packed = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=1)  # [2B,2,F,T]
        packed = packed.reshape(B, 4, c.n_bins, c.dim_t)[:, :, : c.dim_f]
        return jnp.transpose(packed, (0, 3, 2, 1))  # [B, T, F, 4]

    def unpack_istft(self, s: jax.Array) -> jax.Array:
        """[B, dim_t, dim_f, 4] → [B, 2, chunk] (reference ``istft``, ``:214-222``:
        zero-pad the cropped top bins, inverse FFT, overlap-add)."""
        c = self.cfg
        B = s.shape[0]
        s = jnp.transpose(s, (0, 3, 2, 1))  # [B, 4, F, T]
        s = jnp.pad(s, ((0, 0), (0, 0), (0, c.n_bins - c.dim_f), (0, 0)))
        s = s.reshape(B * 2, 2, c.n_bins, c.dim_t)
        spec = jax.lax.complex(s[:, 0], s[:, 1])  # [2B, n_bins, T]
        wav = istft(spec, c.n_fft, c.hop, window=self._window, center=True)
        return wav.reshape(B, 2, -1)

    # ------------------------------------------------------------- model run
    def _spec_to_spec(self, params, spek):
        if self.is_denoise:  # sign-flip noise-cancelling average (:267)
            # one 2B-batch apply instead of two B-batch applies: identical
            # numerics (eval-mode network is batch-independent), half the
            # compile graph (the doubled U-Net graph crashed the TPU
            # compiler at B=8), and better MXU utilization per pass
            B = spek.shape[0]
            both = self.model.apply(
                params, jnp.concatenate([-spek, spek], axis=0)
            )
            return -both[:B] * 0.5 + both[B:] * 0.5
        return self.model.apply(params, spek)

    def run_model(self, mix: jax.Array, is_match_mix: bool = False) -> np.ndarray:
        """[B, 2, chunk] → [2, B*gen] (reference ``run_model``, ``:259-271``)."""
        mix = jnp.asarray(mix)
        if self._in_sharding is not None and mix.shape[0] % self._in_sharding.mesh.shape["data"] == 0:
            mix = jax.device_put(mix, self._in_sharding)
        spek = self.pack_stft(mix) * self.adjust
        # zero the 3 lowest-frequency bins (:262)
        spek = spek.at[:, :, :3, :].set(0.0)
        spec_pred = spek if is_match_mix else self._run(self.params, spek)
        wav = self.unpack_istft(spec_pred)[:, :, self.trim : -self.trim]
        return np.asarray(jnp.transpose(wav, (1, 0, 2)).reshape(2, -1))

    # ---------------------------------------------------------------- demix
    def initialize_mix(self, mix: np.ndarray) -> Tuple[np.ndarray, int]:
        """Pad + slide into chunk windows (reference ``initialize_mix``,
        ``:241-256``). mix: [2, T] → ([n, 2, chunk_size], pad)."""
        n_sample = mix.shape[1]
        pad = self.gen_size - n_sample % self.gen_size
        mix_p = np.concatenate(
            [np.zeros((2, self.trim), np.float32), mix.astype(np.float32),
             np.zeros((2, pad), np.float32), np.zeros((2, self.trim), np.float32)],
            axis=1,
        )
        waves = []
        i = 0
        while i < n_sample + pad:
            waves.append(mix_p[:, i : i + self.chunk_size])
            i += self.gen_size
        return np.stack(waves, axis=0), pad

    def demix(self, mix: Dict[int, np.ndarray], is_match_mix: bool = False,
              margin: int = 0) -> np.ndarray:
        """Chunked separation (reference ``demix_base``, ``:274-301``).
        mix: {slice_index: [2, T]} → [2, T_total]."""
        out = None
        keys = list(mix.keys())
        for sl in keys:
            mix_waves, pad = self.initialize_mix(mix[sl])
            parts = []
            for i in range(0, mix_waves.shape[0], self.batch_size):
                chunk = mix_waves[i : i + self.batch_size]
                n_real = chunk.shape[0]
                if n_real < self.batch_size:
                    # pad ragged tail to the fixed batch shape: one compiled
                    # program for the whole run, and even device sharding
                    chunk = np.concatenate(
                        [chunk, np.zeros((self.batch_size - n_real, 2,
                                          self.chunk_size), np.float32)]
                    )
                out_b = self.run_model(chunk, is_match_mix=is_match_mix)
                parts.append(out_b[:, : n_real * self.gen_size])
            tar = np.concatenate(parts, axis=-1)[:, :-pad]
            start = 0 if sl == 0 else margin
            end = None if sl == keys[-1] or margin == 0 else -margin
            seg = tar[:, start:end] * (1.0 / self.adjust)
            out = seg if out is None else np.concatenate([out, seg], axis=-1)
        return out

    # ------------------------------------------------------------- top level
    def separate(
        self, audio: np.ndarray, sr: int, save_background: bool = False
    ) -> Tuple[np.ndarray, Optional[np.ndarray], int]:
        """Full-file separation (reference ``onnx_inference``, ``:303-335``):
        mono→stereo, resample to 44.1 kHz, demix; optional background stem via
        match-mix minus compensated vocal. Returns (vocal [2,T], bg|None, sr)."""
        x = np.asarray(audio, dtype=np.float32)
        if x.ndim == 1:
            x = np.stack([x, x])
        elif x.shape[0] == 1:
            x = np.concatenate([x, x], axis=0)
        if sr != MDX_SAMPLE_RATE:
            x = np.stack(
                [np.asarray(resample(jnp.asarray(ch), sr, MDX_SAMPLE_RATE))
                 for ch in x]
            )
        t0 = time.time()
        vocal = self.demix({0: x})
        bg = None
        if save_background:
            raw = self.demix({0: x}, is_match_mix=True)
            n = min(vocal.shape[-1], raw.shape[-1])
            bg = raw[:, :n] - vocal[:, :n] * self.compensate
        dt = time.time() - t0
        dur = vocal.shape[-1] / MDX_SAMPLE_RATE
        print(f"[uvr5] denoised {dur:.2f}s in {dt:.2f}s (RTF {dur / max(dt, 1e-9):.2f}x)")
        return vocal, bg, MDX_SAMPLE_RATE


class UVR5:
    """Denoising facade used by the CLIs/web UI (reference wrapper classes
    ``tts_multilingual.py:38-86`` / ``inference_gradio.py:49-90``)."""

    def __init__(self, model_path: Optional[str] = None,
                 is_denoise: bool = True, batch_size: int = 8,
                 separator: Optional[MDXSeparator] = None,
                 mesh: Optional[Any] = None):
        if separator is not None:
            self.sep = separator
        elif model_path and Path(model_path).is_file():
            self.sep = MDXSeparator.from_file(
                model_path, is_denoise=is_denoise, batch_size=batch_size,
                mesh=mesh,
            )
        else:
            warnings.warn(
                f"no UVR5 weights at {model_path!r} — random init (testing only)"
            )
            self.sep = MDXSeparator.random_init(
                is_denoise=is_denoise, batch_size=batch_size, mesh=mesh
            )

    def denoise(self, audio: np.ndarray, sr: int) -> Tuple[np.ndarray, int]:
        """Array in → mono denoised array @44.1 kHz out."""
        vocal, _, out_sr = self.sep.separate(audio, sr)
        return vocal.mean(axis=0), out_sr

    def denoise_file(self, path: str, out_path: Optional[str] = None) -> str:
        from lemas_tts_tpu.utils.audio_io import read_audio, write_wav

        wav, sr = read_audio(path)
        den, out_sr = self.denoise(wav, sr)
        if out_path is None:
            p = Path(path)
            out_path = str(p.with_name(p.stem + "_vocal.wav"))
        write_wav(out_path, den, out_sr)
        return out_path
