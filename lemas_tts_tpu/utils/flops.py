"""Analytic FLOPs model of the CFM sampler + TPU peak lookup → MFU.

The per-op budgets in docs/architecture.md answer "where does the time go";
this module answers "is it actually fast" as ONE number: model FLOPs utilized
(MFU) = analytic useful FLOPs / wall / peak. ``bench.py`` emits it next to
RTF so a regression in kernel efficiency is visible even when RTF moves for
other reasons (approximation defaults, batch, NFE).

The model counts the matmul work of the DiT velocity forward exactly
(attention projections + scores/values, FF, per-block AdaLN modulation,
input/text embed, output head) and composes it over the sampler's REAL step
schedule — CFG-active prefix at width 2B (``SamplerSettings.cfg_active_steps``),
truncated tail at width B, block-cache skip steps running ``depth − (hi−lo)``
blocks (``block_cache_flags``). Elementwise/softmax/norm FLOPs and the
vocoder decode (~2% of a bench step) are excluded — reported MFU is slightly
conservative. No reference equivalent (the reference publishes no perf
accounting at all).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np


def dit_block_flops_per_row(arch: Any, n: int) -> float:
    """Matmul FLOPs of ONE DiT block for one batch row of ``n`` frames
    (multiply-accumulate = 2 FLOPs)."""
    d = arch.dim
    inner = arch.heads * arch.dim_head
    attn_proj = 8.0 * n * d * inner          # qkv (3) + out (1) projections
    attn_core = 4.0 * n * n * inner          # q·kᵀ and attn·v
    ff = 4.0 * arch.ff_mult * n * d * d      # in + out matmuls
    modulation = 12.0 * d * d                # AdaLN t_emb → 6 mod vectors
    return attn_proj + attn_core + ff + modulation


def dit_embed_head_flops_per_row(arch: Any, n: int, mel_dim: int) -> float:
    """Per-velocity-call non-block matmul work for one row: input projection,
    ConvPositionEmbedding (2 grouped convs, k=31, groups=16), timestep MLP,
    final AdaLN + mel projection."""
    d = arch.dim
    text_dim = arch.text_dim if arch.text_dim is not None else mel_dim
    input_proj = 2.0 * n * (2 * mel_dim + text_dim) * d
    conv_pos = 2 * (2.0 * n * d * (d / 16.0) * 31)
    time_mlp = 4.0 * d * d
    head = 4.0 * d * d + 2.0 * n * d * mel_dim  # final modulation + proj_out
    return input_proj + conv_pos + time_mlp + head


def text_embed_flops_per_row(arch: Any, n: int, mel_dim: int) -> float:
    """TextEmbedding ConvNeXtV2 stack for one row (runs ONCE per sampler
    call per CFG variant, not per ODE step): per layer a depthwise k=7 conv
    plus two pointwise matmuls at ``conv_mult`` expansion."""
    td = arch.text_dim if arch.text_dim is not None else mel_dim
    per_layer = 2.0 * n * td * 7 + 2 * (2.0 * n * td * td * arch.conv_mult)
    return arch.conv_layers * per_layer


def sampler_call_flops(arch: Any, settings: Any, batch: int, n: int,
                       mel_dim: int = 100) -> float:
    """Total analytic FLOPs of ONE jitted sampler call ([batch, n] bucket)
    under ``settings``' real step schedule (CFG truncation widths, block-cache
    skip schedules, midpoint's two evals per step)."""
    from lemas_tts_tpu.cfm.sampler import block_cache_flags, sway_time_grid

    grid = sway_time_grid(settings.steps, settings.sway_sampling_coef,
                          settings.t_start)
    steps = settings.steps
    k = settings.cfg_active_steps(grid)  # CFG-active prefix length

    if settings.block_cache_range is not None:
        lo, hi = settings.block_cache_range
        flags = block_cache_flags(settings, steps)
        if settings.use_cfg and k < steps:
            flags = flags.copy()
            flags[k] = True  # forced refresh at the 2B→B width boundary
        blocks_per_step = np.where(flags, arch.depth, arch.depth - (hi - lo))
    else:
        blocks_per_step = np.full(steps, arch.depth)

    evals = 2 if settings.method == "midpoint" else 1
    # k = 0 when CFG is off (cfg_active_steps), so this covers both paths
    widths = np.where(np.arange(steps) < k, 2 * batch, batch)

    block_row = dit_block_flops_per_row(arch, n)
    embed_row = dit_embed_head_flops_per_row(arch, n, mel_dim)
    per_step = widths * (blocks_per_step * block_row + embed_row) * evals
    total = float(np.sum(per_step))
    # text embedding once per call (both CFG variants when active)
    n_te = 2 if settings.use_cfg else 1
    total += n_te * batch * text_embed_flops_per_row(arch, n, mel_dim)
    return total


# bf16 peak per chip (dense MXU), TFLOP/s — public cloud.google.com specs.
_PEAK_BF16_TFLOPS = (
    ("v5 lite", 197.0), ("v5litepod", 197.0), ("v5e", 197.0),
    ("v5p", 459.0), ("v5", 459.0),
    ("v6 lite", 918.0), ("v6e", 918.0), ("trillium", 918.0),
    ("v4", 275.0), ("v3", 123.0), ("v2", 45.0),
)


def device_peak_flops(device=None) -> Optional[float]:
    """bf16 peak FLOP/s of ``device`` (default ``jax.devices()[0]``) from its
    device_kind, or None when unknown (e.g. the CPU dev surface).
    ``LEMAS_BENCH_PEAK_TFLOPS`` overrides (bench knob for new chips)."""
    import os

    env = os.environ.get("LEMAS_BENCH_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    if device is None:
        import jax

        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    if "tpu" not in kind:
        return None
    for key, tf in _PEAK_BF16_TFLOPS:
        if key in kind:
            return tf * 1e12
    return None
