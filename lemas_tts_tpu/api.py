"""Top-level ``TTS`` facade — the package's public API.

Mirrors the reference API surface (``lemas_tts/api.py:82-276``): construction
loads config + vocoder + frontend + CFM model; ``infer`` runs zero-shot TTS
from a reference audio/text pair; ``transcribe`` wraps ASR;
``export_wav``/``export_spectrogram`` save artifacts; ``process_phone_list``
adds language-id prefixes for mixed-language phone streams.

TPU-first differences from the reference:
 - one long-lived :class:`~lemas_tts_tpu.infer.pipeline.Synthesizer` holds the
   jitted programs (the reference rebuilds its model per Gradio request,
   SURVEY.md §3.4);
 - device selection is a JAX platform fallback chain (tpu → gpu → cpu)
   instead of cuda/xpu/mps (``api.py:111-124``);
 - checkpoints load from either the reference torch format (converted on the
   fly) or native orbax directories; with no checkpoint the model is
   random-initialized so the full pipeline stays runnable hermetically.
"""

from __future__ import annotations

import os
import random
import warnings
from pathlib import Path
from typing import Any, List, Optional, Sequence

import numpy as np

from lemas_tts_tpu.config import ModelConfig, load_model_config
from lemas_tts_tpu.utils.vocab import Vocab, get_tokenizer

THIS_FILE = Path(__file__)

# Languages recognized as "(lang)" tags (reference ``api.py:109``).
LANGS = {
    "cmn": "zh", "zh": "zh", "en": "en-us", "it": "it", "es": "es",
    "pt": "pt-br", "fr": "fr-fr", "de": "de", "ru": "ru", "id": "id",
    "vi": "vi", "th": "th",
}

_PUNCS = {"#1", "#2", "#3", "#4", "_", "!", ",", ".", "?", '"', "'", "^",
          "。", "，", "？", "！"}


def find_repo_root() -> Path:
    """Walk up from this file to a directory containing ``pretrained_models``
    or a repo marker (reference ``api.py:28-45``)."""
    p = THIS_FILE.parent
    for cand in (p, *p.parents):
        if (cand / "pretrained_models").is_dir() or (cand / ".git").exists():
            return cand
    return p.parent


def find_pretrained_root() -> Path:
    """``LEMAS_PRETRAINED_ROOT`` env override, else ``<repo>/pretrained_models``
    (reference ``api.py:47-80``)."""
    env = os.environ.get("LEMAS_PRETRAINED_ROOT")
    if env:
        return Path(env)
    return find_repo_root() / "pretrained_models"


def resolve_ckpt(path: str, hf_cache_dir: Optional[str] = None) -> str:
    """Resolve ``hf://repo/file`` checkpoint URIs via the HF hub cache
    (reference local→HF fallback, ``tts_multilingual.py:89-117``);
    plain paths pass through."""
    if not path.startswith("hf://"):
        return path
    from huggingface_hub import hf_hub_download  # optional dep

    parts = path[len("hf://"):].split("/", 2)
    if len(parts) < 3 or not all(parts):
        raise ValueError(
            f"bad checkpoint URI {path!r}: expected hf://<org>/<repo>/<file>"
        )
    return hf_hub_download(repo_id=f"{parts[0]}/{parts[1]}",
                           filename=parts[2], cache_dir=hf_cache_dir)


def _select_platform(device: Optional[str]) -> str:
    import jax

    if device:
        return device
    for plat in ("tpu", "gpu", "cpu"):
        try:
            jax.devices(plat)
            return plat
        except RuntimeError:
            continue
    return "cpu"


class TTS:
    """Zero-shot multilingual TTS (reference ``api.py:82-276``)."""

    def __init__(
        self,
        model: str = "multilingual",
        ckpt_file: str = "",
        vocab_file: str = "",
        ode_method: str = "euler",
        use_ema: bool = False,
        vocoder_local_path: Optional[str] = None,
        use_prosody_encoder: bool = False,
        prosody_cfg_path: str = "",
        prosody_ckpt_path: str = "",
        device: Optional[str] = None,
        hf_cache_dir: Optional[str] = None,
        frontend: Optional[str] = "phone",
        compute_dtype: Optional[str] = None,
        attn_backend: Optional[str] = None,
        quantization: Optional[str] = None,  # None | "int8" | "int8_ff"
        # (DiT-only W8A8; "int8" = all block matmuls — the measured serving
        # default, +19-35% RTF at 7.4e-6 mel MSE vs bf16; "int8_ff" = FF
        # matmuls only, keeps the fused attention kernels;
        # docs/performance.md int8 section)
        mesh: Optional[Any] = None,  # jax.sharding.Mesh with a 'data' axis:
        # batches shard over it and params replicate (multi-chip serving;
        # may span processes — serve/multihost.py + `serve_http --multihost`)
    ):
        import jax
        import jax.numpy as jnp

        from lemas_tts_tpu.infer.checkpoints import load_cfm_checkpoint, load_native
        from lemas_tts_tpu.infer.pipeline import Synthesizer
        from lemas_tts_tpu.models.dit import DiT
        from lemas_tts_tpu.models.vocos import Vocos, convert_vocos
        from lemas_tts_tpu.ops.attention import default_backend

        # "euler" = reference parity (cfm.py:456); "midpoint" = 2nd-order
        # option of the jitted sampler (cfm/sampler.py SamplerSettings.method)
        assert ode_method in ("euler", "midpoint"), ode_method
        self.ode_method = ode_method
        self.config: ModelConfig = load_model_config(model)
        self.mel_spec_type = self.config.mel_spec.mel_spec_type
        self.target_sample_rate = self.config.mel_spec.target_sample_rate
        self.langs = dict(LANGS)
        self.use_ema = use_ema
        self.seed: Optional[int] = None

        self.platform = _select_platform(device)
        # Pin the model to a device of the selected platform: params are
        # committed there, so every jitted program follows (this is what makes
        # device='cpu' and the CLI tpu→cpu fallback actually take effect).
        try:
            self.jax_device = jax.devices(self.platform)[0]
        except RuntimeError:
            if device:
                # an EXPLICIT device request must fail loudly — silently
                # substituting another platform would hide the problem and
                # defeat the CLI's advertised tpu→cpu fallback handling
                raise RuntimeError(
                    f"requested device {device!r} has no available jax "
                    f"devices (platforms here: "
                    f"{ {d.platform for d in jax.devices()} })"
                )
            self.jax_device = jax.devices()[0]
            self.platform = self.jax_device.platform
        if compute_dtype is None:
            compute_dtype = "bfloat16" if self.platform == "tpu" else "float32"
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        if attn_backend is None:
            attn_backend = default_backend()

        # ---- vocab / tokenizer (checkpoint contract: custom vocab.txt)
        if not vocab_file:
            cand = find_pretrained_root() / "data" / f"{self.config.name}_grl" / "vocab.txt"
            default_tok = Path(self.config.tokenizer_path)
            if cand.is_file():
                vocab_file = str(cand)
            elif default_tok.is_file():
                vocab_file = str(default_tok)
        if vocab_file:
            self.vocab: Vocab = get_tokenizer(vocab_file, "custom")
        else:
            warnings.warn("no vocab file found — using the byte tokenizer")
            self.vocab = get_tokenizer("", "byte")

        # ---- text frontend
        if frontend is not None:
            from lemas_tts_tpu.text import TextNorm

            self.frontend = TextNorm(dtype=frontend)
        else:
            self.frontend = None

        # ---- checkpoint resolution first: a distilled-student stage dir may
        # carry a student.json sidecar (scripts/distill.py) whose settings —
        # and, for wide-head students, whose head geometry — must be known
        # BEFORE the backbone is built. apply_student_settings consumes the
        # sampler part at infer time.
        self.hf_cache_dir = hf_cache_dir
        ckpt_file = resolve_ckpt(ckpt_file, hf_cache_dir) if ckpt_file else ckpt_file
        self.student: Optional[dict] = None
        if ckpt_file and os.path.isdir(ckpt_file):
            sidecar = Path(ckpt_file) / "student.json"
            if sidecar.is_file():
                import json as _json

                self.student = _json.loads(sidecar.read_text())

        # ---- acoustic model (backbone per config, reference api.py:102)
        use_pros = use_prosody_encoder or self.config.use_prosody_encoder
        self.use_prosody_encoder = use_pros
        a = self.config.arch
        if self.student and self.student.get("arch"):
            # wide-head student geometry (same parameter tree as the config
            # arch — only the runtime head split differs; ops/attention.py
            # nhd_supported admits d128 single-head programs)
            import dataclasses

            a = dataclasses.replace(
                a, **{k: int(v) for k, v in self.student["arch"].items()})
            self.config = dataclasses.replace(self.config, arch=a)
        backbone = self.config.backbone
        if quantization is not None and backbone != "DiT":
            raise ValueError("quantization is only supported for the DiT backbone")
        if backbone == "DiT":
            self.dit = DiT(
                arch=a,
                mel_dim=self.config.mel_spec.n_mel_channels,
                text_num_embeds=self.vocab.size,
                use_prosody_encoder=use_pros,
                attn_backend=attn_backend,
                compute_dtype=dtype,
                quant=quantization,
            )
        elif backbone == "MMDiT":
            from lemas_tts_tpu.models.mmdit import MMDiT

            self.dit = MMDiT(
                dim=a.dim, depth=a.depth, heads=a.heads, dim_head=a.dim_head,
                ff_mult=a.ff_mult, mel_dim=self.config.mel_spec.n_mel_channels,
                text_num_embeds=self.vocab.size, qk_norm=a.qk_norm,
                text_mask_padding=a.text_mask_padding,
                attn_backend=attn_backend, compute_dtype=dtype,
            )
        elif backbone == "UNetT":
            from lemas_tts_tpu.models.unett import UNetT

            self.dit = UNetT(
                dim=a.dim, depth=a.depth, heads=a.heads, dim_head=a.dim_head,
                ff_mult=a.ff_mult, mel_dim=self.config.mel_spec.n_mel_channels,
                text_num_embeds=self.vocab.size, text_dim=a.text_dim,
                text_mask_padding=a.text_mask_padding, qk_norm=a.qk_norm,
                conv_layers=a.conv_layers, pe_attn_head=a.pe_attn_head,
                attn_backend=attn_backend, compute_dtype=dtype,
            )
        else:
            raise ValueError(f"unknown backbone: {backbone}")
        if ckpt_file and os.path.isdir(ckpt_file):
            cfm_params = load_native(ckpt_file)
            if "dit" not in cfm_params:
                # distill stages save the raw student tree
                # (scripts/distill.py save_native(student, stage_dir)) —
                # either {"params": ...} (flax init convention) or the bare
                # param dict
                cfm_params = {"dit": cfm_params.get("params", cfm_params)}
        elif ckpt_file:
            cfm_params = load_cfm_checkpoint(ckpt_file, use_ema=use_ema)
        else:
            warnings.warn("no checkpoint — random-initializing model weights")
            cfm_params = {
                "dit": self._random_dit_params(jax.random.key(0))["params"]
            }
        if quantization is not None:
            # quantize the float tree (idempotent: already-quantized native
            # trees have kernel_q leaves, which the converter passes through)
            from lemas_tts_tpu.ops.quant import (FF_QUANT_NAMES,
                                                 quantize_dense_tree)

            cfm_params = dict(cfm_params)
            cfm_params["dit"] = quantize_dense_tree(
                cfm_params["dit"],
                names=FF_QUANT_NAMES if quantization == "int8_ff" else None)
        if use_pros and "prosody_to_mel" not in cfm_params:
            # prosody_to_mel Linear(512→mel) (cfm.py:144) — synthesized only
            # when the checkpoint doesn't carry it (e.g. random-init fallback)
            k = jax.random.key(2)
            D = self.config.mel_spec.n_mel_channels
            cfm_params = dict(cfm_params)
            cfm_params["prosody_to_mel"] = {
                "kernel": jax.random.normal(k, (512, D), jnp.float32) * 0.02,
                "bias": jnp.zeros((D,), jnp.float32),
            }
        dit_params = {"params": cfm_params["dit"]}
        self.prosody_to_mel = cfm_params.get("prosody_to_mel")

        # ---- prosody encoder (frozen, optional)
        self.prosody_encoder = None
        if use_pros:
            from lemas_tts_tpu.models.prosody import ProsodyEncoder

            self.prosody_encoder = ProsodyEncoder.build(
                cfg_path=prosody_cfg_path or self.config.prosody_cfg_path,
                ckpt_path=prosody_ckpt_path or self.config.prosody_ckpt_path,
            )

        # ---- vocoder (vocos | bigvgan, reference load_vocoder :120-159)
        voc_path = vocoder_local_path
        self._vocoder_path_is_default = vocoder_local_path is None
        if self.mel_spec_type == "bigvgan":
            from lemas_tts_tpu.models.bigvgan import BigVGAN, BigVGANConfig

            if voc_path is None:
                voc_path = str(
                    find_pretrained_root() / "ckpts"
                    / "bigvgan_v2_24khz_100band_256x"
                )
            voc = BigVGAN(
                cfg=BigVGANConfig.for_hop(
                    self.config.mel_spec.hop_length,
                    self.config.mel_spec.n_mel_channels,
                ),
                compute_dtype=dtype,
            )
            voc_params = self._load_bigvgan_params(voc, voc_path)
        else:
            if voc_path is None:
                voc_path = str(find_pretrained_root() / "ckpts" / "vocos-mel-24khz")
            voc = Vocos(
                input_channels=self.config.mel_spec.n_mel_channels,
                n_fft=self.config.mel_spec.n_fft,
                hop_length=self.config.mel_spec.hop_length,
                compute_dtype=dtype,
            )
            voc_params = self._load_vocoder_params(voc, voc_path, convert_vocos)

        # commit params to the selected device — jit follows their placement.
        # With a mesh, the Synthesizer replicates params over it instead
        # (single-device commit first would pin a cross-host copy source).
        if mesh is None:
            dit_params = jax.device_put(dit_params, self.jax_device)
            voc_params = jax.device_put(voc_params, self.jax_device)
        self.synth = Synthesizer(
            self.dit,
            dit_params,
            voc,
            voc_params,
            self.vocab,
            self.config.mel_spec,
            prosody_encoder=self.prosody_encoder,
            prosody_to_mel=self.prosody_to_mel,
            mesh=mesh,
        )

    # ------------------------------------------------------------------ setup
    def _random_dit_params(self, key):
        import dataclasses

        import jax.numpy as jnp

        # a quantized DiT init()s to zero int8 kernels; random weights must
        # come from the float twin (then quantize, like a real checkpoint)
        model = (dataclasses.replace(self.dit, quant=None)
                 if getattr(self.dit, "quant", None) else self.dit)
        D = self.config.mel_spec.n_mel_channels
        return model.init(
            key,
            jnp.zeros((1, 32, D)),
            jnp.zeros((1, 32, D)),
            jnp.zeros((1, 8), jnp.int32),
            jnp.zeros((1,)),
            prosody_text=(
                jnp.zeros((1, 8, 512)) if self.use_prosody_encoder else None
            ),
        )

    def _load_vocoder_params(self, voc, voc_path: str, convert_vocos):
        import jax
        import jax.numpy as jnp

        p = Path(voc_path)
        native = p / "native"
        torch_bin = p / "pytorch_model.bin"
        if native.is_dir():
            from lemas_tts_tpu.infer.checkpoints import load_native

            return load_native(str(native))
        if torch_bin.is_file():
            from lemas_tts_tpu.infer.checkpoints import load_state_dict

            return {"params": convert_vocos(load_state_dict(str(torch_bin)))}
        # HF-hub fallback (reference load_vocoder, utils_infer.py:127-131) —
        # ONLY for the default path; an explicitly-passed-but-missing
        # vocoder_local_path must fail loudly, not silently substitute stock
        # weights. Cache checked offline-fast; network gated behind
        # LEMAS_HF_FALLBACK=1. Conversion errors propagate (a corrupt file is
        # a real error, not a reason to run on random weights).
        if getattr(self, "_vocoder_path_is_default", False):
            f = None
            try:
                from huggingface_hub import hf_hub_download

                f = hf_hub_download("charactr/vocos-mel-24khz",
                                    "pytorch_model.bin", local_files_only=True,
                                    cache_dir=getattr(self, "hf_cache_dir", None))
            except Exception:
                if os.environ.get("LEMAS_HF_FALLBACK") == "1":
                    from huggingface_hub import hf_hub_download

                    f = hf_hub_download("charactr/vocos-mel-24khz",
                                        "pytorch_model.bin",
                                        cache_dir=getattr(self, "hf_cache_dir", None))
            if f is not None:
                from lemas_tts_tpu.infer.checkpoints import load_state_dict

                return {"params": convert_vocos(load_state_dict(f))}
        warnings.warn(f"no vocoder weights at {voc_path} — random init")
        D = self.config.mel_spec.n_mel_channels
        return voc.init(jax.random.key(1), jnp.zeros((1, D, 16)))

    def _load_bigvgan_params(self, voc, voc_path: str):
        import jax
        import jax.numpy as jnp

        from lemas_tts_tpu.models.bigvgan import convert_bigvgan

        p = Path(voc_path)
        cand = next(
            (q for q in (p / "bigvgan_generator.pt", p / "pytorch_model.bin",
                         p / "g_05000000", p)
             if q.is_file()),
            None,
        )
        if cand is not None:
            from lemas_tts_tpu.infer.checkpoints import load_state_dict

            sd = load_state_dict(str(cand))
            if any(k.startswith("generator.") for k in sd):
                sd = {k[len("generator."):]: v for k, v in sd.items()
                      if k.startswith("generator.")}
            return {"params": convert_bigvgan(sd, voc.cfg)}
        warnings.warn(f"no BigVGAN weights at {voc_path} — random init")
        D = self.config.mel_spec.n_mel_channels
        return voc.init(jax.random.key(1), jnp.zeros((1, D, 8)))

    # ------------------------------------------------------------------- ASR
    def prepare_units(self, text: str):
        """One text → frontend token units, exactly as :meth:`infer` prepares
        them (phone: ``text2phn`` split on ``|`` with ``(cmn)``→``(zh)``;
        char: ``text2norm`` + lang tag; no frontend: raw string). Serving
        layers must use this instead of passing raw ``text2phn`` strings —
        ``text_to_ids`` would otherwise tokenize them character-by-character."""
        if getattr(self.vocab, "char_map", None) is None:
            # byte tokenizer (no vocab.txt): raw UTF-8 strings only —
            # phone/char unit lists are unmappable (utils/vocab.py)
            return text
        if self.frontend is not None and self.frontend.dtype == "phone":
            return (
                self.frontend.text2phn(text + ". ")
                .replace("(cmn)", "(zh)")
                .split("|")
            )
        if self.frontend is not None:
            lang, norm = self.frontend.text2norm(text + ". ")
            return [f"({lang.replace('cmn', 'zh')})"] + list(norm)
        return text

    def transcribe(self, ref_audio: str, language: Optional[str] = None) -> str:
        from lemas_tts_tpu.infer.asr import transcribe

        return transcribe(ref_audio, language)

    # --------------------------------------------------------------- exports
    def export_wav(self, wav: np.ndarray, file_wave: str,
                   remove_silence: bool = False) -> None:
        from lemas_tts_tpu.infer.audio_prep import remove_long_silence
        from lemas_tts_tpu.utils.audio_io import write_wav

        if remove_silence:
            wav = remove_long_silence(np.asarray(wav), self.target_sample_rate)
        write_wav(file_wave, np.asarray(wav), self.target_sample_rate)

    def export_spectrogram(self, spec: np.ndarray, file_spec: str) -> None:
        """Save a [n_mels, T] spectrogram image (reference
        ``utils_infer.py:646-651``)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(12, 4))
        plt.imshow(np.asarray(spec), origin="lower", interpolation="nearest",
                   aspect="auto")
        plt.colorbar()
        plt.savefig(file_spec)
        plt.close(fig)

    # ----------------------------------------------------------------- infer
    def infer(
        self,
        ref_file: str,
        ref_text: str,
        gen_text: str,
        show_info=print,
        progress=None,
        target_rms: float = 0.1,
        cross_fade_duration: float = 0.15,
        use_acc_grl: bool = False,
        ref_ratio: Optional[float] = None,
        no_ref_audio: bool = False,
        cfg_strength: float = 2.0,
        nfe_step: int = 32,
        speed: float = 1.0,
        sway_sampling_coef: Optional[float] = 5,
        cfg_cutoff: Optional[float] = None,
        block_cache: Optional[str] = None,  # "lo-hi:every" residual cache
        separate_langs: bool = False,
        fix_duration: Optional[float] = None,
        use_prosody_encoder: bool = True,
        file_wave: Optional[str] = None,
        file_spec: Optional[str] = None,
        seed: Optional[int] = None,
    ):
        """Zero-shot TTS (reference ``api.py:171-249``). Returns
        ``(wav, sample_rate, spec)``."""
        from lemas_tts_tpu.config import SamplerConfig
        from lemas_tts_tpu.infer.pipeline import chunk_text
        from lemas_tts_tpu.infer.preprocess import preprocess_ref_audio_text

        if seed is None:
            seed = random.randint(0, 2**31 - 1)
        self.seed = seed

        wav, sr, ref_text = preprocess_ref_audio_text(
            ref_file, ref_text, show_info=show_info
        )

        # byte tokenizer (no vocab.txt) forces the raw-string path: phone/
        # char unit lists would be unmappable (utils/vocab.py raises on
        # lists)
        byte_vocab = getattr(self.vocab, "char_map", None) is None
        use_raw_units = byte_vocab or self.frontend is None
        if not use_raw_units and self.frontend.dtype == "phone":
            ref_units = (
                self.frontend.text2phn(ref_text + ". ")
                .replace("(cmn)", "(zh)")
                .split("|")
            )
            gen_chunks = [
                self.frontend.text2phn(x + ". ").replace("(cmn)", "(zh)").split("|")
                for x in gen_text.split("\n")
            ]
        elif not use_raw_units:  # char frontend (api.py:206-211)
            src_lang, norm = self.frontend.text2norm(ref_text + ". ")
            ref_units = [f"({src_lang.replace('cmn', 'zh')})"] + list(norm)
            gen_chunks = []
            for x in gen_text.split("\n"):
                lang, norm = self.frontend.text2norm(x + ". ")
                gen_chunks.append([f"({lang.replace('cmn', 'zh')})"] + list(norm))
        else:  # raw-string path with byte-budget chunking
            ref_units = ref_text
            max_chars = int(
                len(ref_text.encode("utf-8"))
                / (wav.shape[-1] / sr)
                * (22 - wav.shape[-1] / sr)
            ) if wav.shape[-1] > 0 else 135
            gen_chunks = chunk_text(gen_text, max_chars=max(1, max_chars))

        if separate_langs and not isinstance(ref_units, str):
            ref_units = self.process_phone_list(ref_units)
            gen_chunks = [self.process_phone_list(x) for x in gen_chunks]

        cfg = SamplerConfig(
            nfe_steps=nfe_step,
            cfg_strength=cfg_strength,
            sway_sampling_coef=sway_sampling_coef,
            cfg_cutoff=cfg_cutoff,
            block_cache=block_cache,
            ode_method=self.ode_method,
            speed=speed,
            target_rms=target_rms,
            cross_fade_duration=cross_fade_duration,
            use_acc_grl=use_acc_grl,
            use_prosody_encoder=use_prosody_encoder and self.use_prosody_encoder,
            ref_ratio=ref_ratio,
            no_ref_audio=no_ref_audio,
            fix_duration=fix_duration,
            seed=seed,
        )
        cfg = self.apply_student_settings(cfg, show_info=show_info)
        wave, out_sr, spec = self.synth.synthesize_chunks(
            wav, sr, ref_units, gen_chunks, cfg=cfg, seed=seed
        )

        if file_wave is not None:
            self.export_wav(wave, file_wave)
        if file_spec is not None:
            self.export_spectrogram(spec, file_spec)
        return wave, out_sr, spec

    # ------------------------------------------------------- distilled student
    def apply_student_settings(self, cfg, show_info=None):
        """When this TTS was loaded from a distilled-student checkpoint
        (``scripts/distill.py`` stage dir with a ``student.json`` sidecar),
        pin the sampler settings the student was trained for: ``steps=K``,
        ``cfg_strength=0`` (guidance is baked into the weights — a CFG
        forward would double-guide), the training sway warp, no CFG
        cutoff (nothing to truncate), and NO block-residual cache: the
        serving-default cache spec was calibrated at NFE=32 where a
        refresh-every-2 cache is stale for 1/16 of the trajectory — at
        student NFE 8 the same spec is stale for 1/4 of it, and a probed
        spec can be opted back in via the ``block_cache`` sidecar key
        (``scripts/student_stack_probe.py`` measures the stacking).
        Caller-supplied NFE/CFG values are overridden — sampling a student
        off its grid is a quality bug, not a preference. No-op for
        ordinary checkpoints."""
        if self.student is None:
            return cfg
        import dataclasses

        new = dataclasses.replace(
            cfg,
            nfe_steps=int(self.student["student_steps"]),
            cfg_strength=float(self.student.get("cfg_strength", 0.0)),
            sway_sampling_coef=self.student.get("sway_sampling_coef"),
            cfg_cutoff=None,
            block_cache=self.student.get("block_cache"),
        )
        if show_info is not None and (
            cfg.nfe_steps != new.nfe_steps
            or cfg.cfg_strength != new.cfg_strength
        ):
            show_info(
                f"distilled student checkpoint: sampler pinned to "
                f"steps={new.nfe_steps}, cfg_strength=0 (baked-in guidance)"
            )
        return new

    # ------------------------------------------------------- phone-list utils
    def process_phone_list(self, parts: Sequence[str]) -> List[str]:
        return process_phone_list(parts, self.langs)


def _main() -> None:
    """Smoke entry (the reference's ``__main__`` is broken — ``api.py:280``
    instantiates an undefined name; this one works hermetically)."""
    import tempfile

    from lemas_tts_tpu.utils.audio_io import write_wav

    sr = 24000
    t = np.arange(2 * sr) / sr
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        ref_path = f"{d}/ref.wav"
        write_wav(ref_path, ref, sr)
        tts = TTS()
        wav, out_sr, _ = tts.infer(
            ref_file=ref_path,
            ref_text="some call me nature, others call me mother nature.",
            gen_text="I've been a silent spectator, watching species evolve.",
            nfe_step=16,
            file_wave=f"{d}/api_out.wav",
        )
        print(f"seed: {tts.seed}  wave: {len(wav) / out_sr:.2f}s @ {out_sr} Hz")


def process_phone_list(parts: Sequence[str], langs=LANGS) -> List[str]:
    """Prefix bare phones with the current ``(lang)`` tag and collapse
    separator/punctuation runs (reference ``api.py:252-276``)."""
    processed: List[str] = []
    current_lang = ""
    for part in parts:
        if part.startswith("(") and part.endswith(")") and part[1:-1] in langs:
            current_lang = part
        elif part in _PUNCS:
            if processed and processed[-1] == "_":
                processed.pop()
            elif processed and processed[-1] in _PUNCS and part == "_":
                continue
            processed.append(part)
        elif current_lang is not None:
            # NOTE: current_lang starts as "" (never None) so phones before
            # the first (lang) tag pass through bare — this replicates the
            # reference exactly (api.py:257,273: same init + same guard).
            processed.append(f"{current_lang}{part}")
    return processed


if __name__ == "__main__":
    _main()
