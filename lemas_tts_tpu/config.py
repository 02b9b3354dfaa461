"""Typed configuration system.

Mirrors the fields of the reference hydra YAMLs
(``/root/reference/lemas_tts/configs/multilingual_grl.yaml:36-70``) as frozen
dataclasses, so that model construction is fully static/typed and jit-friendly.
YAML files with the same schema load directly via :func:`load_model_config`.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional

import yaml

CONFIG_DIR = Path(__file__).parent / "configs"


@dataclass(frozen=True)
class DiTArch:
    """DiT backbone hyper-parameters (reference ``configs/*.yaml`` model.arch)."""

    dim: int = 1024
    depth: int = 22
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 2
    text_dim: int = 512
    text_mask_padding: bool = True
    qk_norm: Optional[str] = None  # None | "rms_norm"
    conv_layers: int = 4
    conv_mult: int = 2
    pe_attn_head: Optional[int] = None
    long_skip_connection: bool = False
    checkpoint_activations: bool = False
    dropout: float = 0.1

    @property
    def inner_dim(self) -> int:
        return self.heads * self.dim_head


@dataclass(frozen=True)
class MelSpecConfig:
    """Mel-spectrogram frontend parameters (reference ``model.mel_spec``)."""

    target_sample_rate: int = 24000
    n_mel_channels: int = 100
    hop_length: int = 256
    win_length: int = 1024
    n_fft: int = 1024
    mel_spec_type: str = "vocos"  # "vocos" | "bigvgan"

    @property
    def frames_per_second(self) -> float:
        return self.target_sample_rate / self.hop_length


@dataclass(frozen=True)
class VocoderConfig:
    is_local: bool = True
    local_path: str = "pretrained_models/ckpts/vocos-mel-24khz"
    name: str = "vocos"  # "vocos" | "bigvgan"


@dataclass(frozen=True)
class ModelConfig:
    """Top-level model config (reference ``model:`` section)."""

    name: str = "multilingual"
    backbone: str = "DiT"
    tokenizer: str = "custom"
    tokenizer_path: str = "pretrained_models/data/multilingual_grl/vocab.txt"
    use_ctc_loss: bool = True
    use_spk_enc: bool = False
    use_prosody_encoder: bool = False
    prosody_cfg_path: str = "pretrained_models/ckpts/prosody_encoder/pretssel_cfg.json"
    prosody_ckpt_path: str = (
        "pretrained_models/ckpts/prosody_encoder/prosody_encoder_UnitY2.pt"
    )
    arch: DiTArch = field(default_factory=DiTArch)
    mel_spec: MelSpecConfig = field(default_factory=MelSpecConfig)
    vocoder: VocoderConfig = field(default_factory=VocoderConfig)


# Measured serving default for CFG truncation (docs/performance.md): skipping
# the uncond forward once cfg_strength·(1−t)² decays below 0.5 lifts v5e
# serving throughput 37.7 → 43.5 audio-s/s (B=8, NFE=32) at 1.5e-5 mel MSE
# vs the full-CFG trajectory — 65× inside the 1e-3 parity bar. The library
# SamplerConfig default stays None (exact reference semantics,
# cfm.py:393-424); the serving entry points opt in with this value.
SERVING_CFG_CUTOFF = 0.5

# Measured serving default for the block-range residual cache
# (SamplerSettings.block_cache_range, scripts/blockcache_probe.py): refresh
# the FULL block stack's aggregate residual every 2nd ODE step (dense final
# 2 steps), one cached add in between. On-chip at the serving settings
# (NFE=32, CFG 2, cutoff 0.5, B=8): 1.74× sampler speedup at 1.68e-4 mel
# MSE / 0.35 dB MCD vs the uncached trajectory — 6× inside the 1e-3 parity
# bar, and Pareto-dominant over the round-2 default "2-20:2" (1.56× at the
# same error). Library SamplerConfig default stays None (exact reference
# semantics); serving entry points opt in with this value.
SERVING_BLOCK_CACHE = "0-22:2+t2"

# Measured serving default for DiT weight/activation quantization
# (ops/quant.py W8A8, per-channel weights / dynamic per-token activations /
# int32 accumulation). Round-1 measured int8 as a LOSS at B=1 on the
# pre-layout-fix kernels (22.8 vs 24.4 audio-s/s) and it shipped as a
# memory-only mode; the round-5 re-probe (VERDICT r4 item 9) on the
# current kernel stack flipped it: on-chip at the serving defaults,
# teacher B=8 76.7 → 91.6 audio-s/s (+19%), NFE-8 wide-head student
# 299 → 370 (+24%), at int8-vs-bf16 trajectory divergence of 4.9e-6 mel
# MSE exact / 7.4e-6 at the serving approximations (rel-L2 ~0.1%,
# identical at h16/d64 and h8/d128) — 20× below the error the block-cache
# default already accepts and 100× inside the 1e-3 parity bar. Library
# default stays None (exact float semantics); serving entry points and
# bench.py opt in with this value. LEMAS_SERVING_QUANT="" disables.
def resolve_quant(value: Optional[str]) -> Optional[str]:
    """One quant-knob grammar for every entry point: ``None``/``""``/
    ``"none"``/``"0"``/``"off"`` disable, ``"default"`` means the serving
    default, anything else is a mode string validated at model build
    (models/modules.py). Divergent per-CLI copies of this normalization
    once let ``LEMAS_SERVING_QUANT=none`` crash serve_http at warmup."""
    if value is None or str(value).strip().lower() in ("", "none", "0",
                                                       "off"):
        return None
    v = str(value).strip()
    return SERVING_QUANT if v == "default" else v


SERVING_QUANT: Optional[str] = resolve_quant(
    os.environ.get("LEMAS_SERVING_QUANT", "int8"))

# Evidence-freshness stamp for the serving-default approximations above.
# CI (tests/test_utils.py) asserts this record matches the LIVE defaults, so
# flipping a default without re-probing — and updating this stamp — fails
# the suite; the bench JSON carries `approx_calibration` so every headline
# states what its error bars were measured on. `calibration` records the
# weights the probe grids ran with: "random-weights" (trajectory-divergence
# scale can shift on trained weights) until scripts/validate_assets.py
# re-probes with --ckpt on real assets (its reprobe_cutoff/reprobe_blockcache
# steps), after which update this to "real-weights:<ckpt-id>" with the new
# probe date.
SERVING_DEFAULTS_EVIDENCE = {
    "cfg_cutoff": 0.5,
    "block_cache": "0-22:2+t2",
    "quant": "int8",
    "calibration": "random-weights",
    "probe": "scripts/cutoff_probe.py + scripts/blockcache_probe.py, "
             "on-chip edge-inclusive grid (docs/performance.md); int8: "
             "round-5 on-chip re-probe at both head geometries "
             "(docs/performance.md int8 section)",
    "probed": "2026-08-20",
}


@dataclass(frozen=True)
class SamplerConfig:
    """CFM sampler parameters.

    Canonical CLI defaults follow the reference shell wrappers
    (``tts_multilingual.sh:27-30``: NFE 64, CFG 5.0, sway 3.0); the library
    defaults here follow ``utils_infer.py:77-79`` (NFE 32, CFG 3.0, sway 1).
    """

    nfe_steps: int = 32
    cfg_strength: float = 3.0
    sway_sampling_coef: Optional[float] = 1.0
    # "euler" (reference parity) | "midpoint" (2nd-order: better mel at the
    # same number of velocity evals when halving nfe_steps)
    ode_method: str = "euler"
    # opt-in CFG truncation: skip the uncond forward once
    # cfg_strength·(1−t)² < cfg_cutoff (see SamplerSettings.cfg_cutoff)
    cfg_cutoff: Optional[float] = None
    # opt-in block-range residual cache, spec "lo-hi:every" (see
    # SamplerSettings.block_cache_range / sampler.parse_block_cache);
    # serving defaults to SERVING_BLOCK_CACHE
    block_cache: Optional[str] = None
    max_duration: int = 4096
    speed: float = 1.0
    target_rms: float = 0.1
    cross_fade_duration: float = 0.15
    use_acc_grl: bool = True
    use_prosody_encoder: bool = True
    ref_ratio: Optional[float] = None
    no_ref_audio: bool = False
    fix_duration: Optional[float] = None
    seed: Optional[int] = None
    # inner-time-step observability corner (reference cfm.py:221-222,439-443):
    # start the ODE at t_inter from a cond-duplicated state
    duplicate_test: bool = False
    t_inter: float = 0.1


@dataclass(frozen=True)
class TrainConfig:
    """Training fields mirrored from the reference ``optim:``/``datasets:`` sections."""

    epochs: int = 100
    learning_rate: float = 1e-5
    num_warmup_updates: int = 1000
    grad_accumulation_steps: int = 1
    max_grad_norm: float = 1.0
    batch_size_per_gpu: int = 40000
    batch_size_type: str = "frame"
    max_samples: int = 64
    audio_drop_prob: float = 0.3
    text_drop_prob: float = 0.1
    frac_lengths_mask: tuple[float, float] = (0.7, 1.0)
    save_per_updates: int = 1000
    keep_last_n_checkpoints: int = -1
    last_per_updates: int = 1000


def _filter_kwargs(cls, d: dict[str, Any]) -> dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


def load_model_config(name_or_path: str | os.PathLike) -> ModelConfig:
    """Load a :class:`ModelConfig` from a YAML file.

    Accepts a bare model name (resolved against the bundled ``configs/`` dir,
    like the reference ``api.py:99-100``) or a filesystem path.
    """
    p = Path(name_or_path)
    if not p.suffix:
        p = CONFIG_DIR / f"{p.name}.yaml"
    with open(p, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f)

    m = raw.get("model", raw)
    arch = DiTArch(**_filter_kwargs(DiTArch, m.get("arch", {})))
    mel = MelSpecConfig(**_filter_kwargs(MelSpecConfig, m.get("mel_spec", {})))
    voc = VocoderConfig(**_filter_kwargs(VocoderConfig, m.get("vocoder", {})))
    return ModelConfig(
        arch=arch,
        mel_spec=mel,
        vocoder=voc,
        **_filter_kwargs(
            ModelConfig,
            {k: v for k, v in m.items() if k not in ("arch", "mel_spec", "vocoder")},
        ),
    )
