"""RTF benchmark: flagship CFM/DiT synthesis at NFE=32 on one chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", "batch"}.
Baseline north star (BASELINE.md): ≥20× real-time per chip at NFE=32.

Measures the full generation path — jitted Euler/CFG sampler (2×22
transformer blocks per step, fused Pallas VMEM attention) + batched masked
Vocos decode — on randomly initialized flagship weights (RTF is
weight-independent). Default batch is 8, the serving engine's measured
sweet spot (serve/engine.py max_batch; on v5e at the serving defaults incl.
cfg_cutoff=0.5 AND block_cache="0-22:2+t2": B=8 → 76.7 audio-s/s per chip
measured round 3 (75.1 in BENCH_r02 before the static-segment rewrite);
33.1/43.4/44.7 at B=1/8/16 without the block cache; 29.7/37.7/38.9 at
exact full CFG), so the headline is per-chip serving throughput. The emitted approx_mel_mse self-certifies the approximation
defaults (see below). The host has one
CPU: run the bench strictly alone or dispatch contention skews it.
Set LEMAS_BENCH_BATCH=1 for single-stream RTF. Timing forces device
completion by fetching a scalar reduction of the waveform; fetching the
full audio is excluded because the benchmarking tunnel's device→host path
(~3 MB/s) is not representative of TPU serving I/O.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from lemas_tts_tpu.cfm.sampler import SamplerSettings, make_sampler
from lemas_tts_tpu.config import DiTArch
from lemas_tts_tpu.models.dit import DiT
from lemas_tts_tpu.models.vocos import Vocos
from lemas_tts_tpu.ops.attention import default_backend
from lemas_tts_tpu.ops.quant import quantize_dense_tree

SR = 24000
HOP = 256
# LEMAS_BENCH_NFE / LEMAS_BENCH_CFG / LEMAS_BENCH_SWAY probe the canonical
# CLI settings (NFE=64, CFG 5.0, sway 3.0 — tts_multilingual.sh); the
# headline stays NFE=32/CFG=2 (BASELINE.md). The benchmark runs the serving
# engine's default CFG truncation (config.SERVING_CFG_CUTOFF=0.5: skip the
# uncond forward once cfg·(1−t)² < 0.5 — measured 1.5e-5 mel MSE vs full
# CFG, 65× inside the 1e-3 parity bar; docs/performance.md). Reported in
# the JSON line; LEMAS_BENCH_CFG_CUTOFF=0 measures exact full CFG.
NFE = int(os.environ.get("LEMAS_BENCH_NFE", "32"))
CFG = float(os.environ.get("LEMAS_BENCH_CFG", "2.0"))
SWAY = float(os.environ.get("LEMAS_BENCH_SWAY", "1.0"))
_cut = float(os.environ.get("LEMAS_BENCH_CFG_CUTOFF") or "-1")
if _cut < 0:
    from lemas_tts_tpu.config import SERVING_CFG_CUTOFF as _cut
CFG_CUTOFF = _cut or None  # 0 → exact full CFG
# Block-range residual cache (SamplerSettings.block_cache_range): the bench
# runs the measured serving default (config.SERVING_BLOCK_CACHE="0-22:2+t2":
# 1.77× sampler speedup at 1.7e-4 mel MSE vs the uncached trajectory — 6×
# inside the 1e-3 parity bar and Pareto-dominant over the round-2 "2-20:2"
# on the on-chip edge-inclusive grid; docs/performance.md probe table).
# LEMAS_BENCH_BLOCK_CACHE overrides ("0" → exact per-step sampling).
_bc = os.environ.get("LEMAS_BENCH_BLOCK_CACHE")
if _bc is None:
    from lemas_tts_tpu.config import SERVING_BLOCK_CACHE as _bc
BLOCK_CACHE = _bc if _bc not in ("0", "", "none") else None
# mel frames ≈ 10.9 s audio at the default; LEMAS_BENCH_N probes the long
# buckets (2048/4096) for the docs/performance.md long-bucket table
N_BUCKET = int(os.environ.get("LEMAS_BENCH_N", "1024"))
REF_FRAMES = 188  # ≈ 2 s reference audio
BATCH = int(os.environ.get("LEMAS_BENCH_BATCH", "8"))
# W8A8 quantization (ops/quant.py): the bench runs the measured serving
# default (config.SERVING_QUANT="int8" — round-5 on-chip re-probe: teacher
# B=8 76.7 → 91.6 audio-s/s, student 299 → 370, at 7.4e-6 mel MSE vs the
# bf16 trajectory — 20× below the accepted block-cache error). When
# quantized, the bench ALSO runs the bf16 float model exact at B=2 and
# gates `quant_mel_mse_vs_bf16` against the same 1e-3 parity bar, so the
# speed row always travels with its dtype-divergence measurement.
# LEMAS_BENCH_QUANT overrides ("0"/"none" → bf16).
from lemas_tts_tpu.config import resolve_quant as _rq

QUANT = _rq(os.environ.get("LEMAS_BENCH_QUANT", "default"))
# block-scan unroll (1 = lax.scan loop; 22 = fully unrolled blocks)
UNROLL = int(os.environ.get("LEMAS_BENCH_UNROLL", "1"))
# Distilled-student row (DEFAULT-ON, round 5): the product fast path —
# K=8 steps, cfg_strength=0 (single forward per step, cfm/distill.py
# student_sampler_settings) at the wide-head h8/d128 geometry (same param
# tree as the flagship teacher — exactly how distillation teacher-copies
# the student init, scripts/distill.py; d128 heads fill the 128-lane MXU
# window, measured +14% e2e over h16/d64). Reported as `student_rtf` and
# GATED: the student trajectory's audio must stay within
# LEMAS_BENCH_STUDENT_SC_GATE spectral convergence of the teacher
# trajectory at matched noise — on the bench's random weights this is a
# regression gate on the student SAMPLER PATH (geometry math, step
# schedule, baked-guidance settings), calibration-stamped like the approx
# gate; validate_assets.py re-probes it with real distilled weights.
# LEMAS_BENCH_STUDENT=0 disables the row; LEMAS_BENCH_STUDENT_ARCH=""
# benches the teacher geometry instead of wide-head.
STUDENT = int(os.environ.get("LEMAS_BENCH_STUDENT", "8"))
STUDENT_ARCH = os.environ.get("LEMAS_BENCH_STUDENT_ARCH", "h8d128")


def fast_random_params(model, init_fn, key):
    """Random params on-device in one program (see utils.misc)."""
    from lemas_tts_tpu.utils.misc import fast_random_params as frp

    return frp(init_fn, key, dtype=jnp.bfloat16)


def run_kernel_check() -> str:
    """On-device vmem-vs-xla agreement gate (scripts/kernel_check.py):
    a fused-kernel numerics regression must fail the bench loudly instead
    of producing fast wrong audio. LEMAS_BENCH_CHECK=0 skips, =full runs
    the whole flagship grid; default checks the headline shape."""
    mode = os.environ.get("LEMAS_BENCH_CHECK", "1")
    if mode == "0":
        return "skipped"
    from lemas_tts_tpu.scripts.kernel_check import check_kernels

    if mode == "full":
        check_kernels()
    else:
        check_kernels(ns=(N_BUCKET,), bs=(1, BATCH))
    return "ok"


def main():
    # persistent XLA cache: repeat bench runs skip the multi-minute tunnel
    # compiles (LEMAS_COMPILE_CACHE overrides; empty string disables)
    from lemas_tts_tpu.utils.misc import enable_compile_cache

    enable_compile_cache(
        os.environ.get("LEMAS_COMPILE_CACHE", "/tmp/lemas_xla_cache")
    )
    kernel_check = run_kernel_check()
    compute_dtype = jnp.bfloat16
    arch = DiTArch()
    model = DiT(arch=arch, mel_dim=100, text_num_embeds=898,
                compute_dtype=compute_dtype, attn_backend=default_backend(),
                quant=QUANT, scan_unroll=UNROLL)
    voc = Vocos(compute_dtype=compute_dtype)

    rng = np.random.default_rng(0)
    B, N, nt = BATCH, N_BUCKET, 256
    text = jnp.asarray(rng.integers(1, 800, (B, nt)).astype(np.int32))

    # random params always come from the float model; the int8 mode converts
    # them exactly like serving converts a float checkpoint.
    fmodel = DiT(arch=arch, mel_dim=100, text_num_embeds=898,
                 compute_dtype=compute_dtype, attn_backend=default_backend())
    params = fast_random_params(
        fmodel,
        lambda k: fmodel.init(k, jnp.zeros((1, 8, 100)), jnp.zeros((1, 8, 100)),
                              jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,))),
        jax.random.key(1),
    )
    fparams = params  # float tree kept for the quant-divergence gate
    if QUANT:
        from functools import partial as _partial

        from lemas_tts_tpu.ops.quant import FF_QUANT_NAMES

        _names = FF_QUANT_NAMES if QUANT == "int8_ff" else None
        params = jax.block_until_ready(
            jax.jit(_partial(quantize_dense_tree, names=_names))(params))
    vparams = fast_random_params(
        voc, lambda k: voc.init(k, jnp.zeros((1, 100, 16))), jax.random.key(2)
    )

    cond = np.zeros((B, N, 100), np.float32)
    cond[:, :REF_FRAMES] = rng.standard_normal((B, REF_FRAMES, 100)) * 0.5 - 5.0
    cond_mask = np.zeros((B, N), bool)
    cond_mask[:, :REF_FRAMES] = True
    duration = np.full(B, N, np.int32)
    y0 = rng.standard_normal((B, N, 100)).astype(np.float32)

    from lemas_tts_tpu.cfm.sampler import block_cache_fields

    settings = SamplerSettings(steps=NFE, cfg_strength=CFG,
                               sway_sampling_coef=SWAY,
                               cfg_cutoff=CFG_CUTOFF,
                               **block_cache_fields(BLOCK_CACHE))
    run = make_sampler(model, settings)
    gen_frames = N - REF_FRAMES
    frame_mask = jnp.asarray((np.arange(N)[None, :] < gen_frames).repeat(B, axis=0))

    @jax.jit
    def vocode_sum(vp, mel):
        gen = jnp.swapaxes(mel[:, REF_FRAMES:, :], -1, -2)
        gen = jnp.pad(gen, ((0, 0), (0, 0), (0, REF_FRAMES)))
        wave = voc.apply(vp, gen, frame_mask, method=Vocos.decode)
        return jnp.sum(wave)

    cond_j = jnp.asarray(cond)
    mask_j = jnp.asarray(cond_mask)
    dur_j = jnp.asarray(duration)

    def synth(y):
        mel = run(params, cond_j, mask_j, text, dur_j, y)
        return float(vocode_sum(vparams, mel))  # scalar fetch = true completion

    ys = [jnp.asarray(y0 * (1.0 + 0.01 * i)) for i in range(6)]
    synth(ys[0])  # warmup / compile

    times = []
    for i in range(1, 6):
        t0 = time.perf_counter()
        synth(ys[i])
        times.append(time.perf_counter() - t0)
    wall = float(np.median(times))

    # --- self-certifying approximation gate: the serving-default
    # approximations (cfg_cutoff, block_cache) must carry their own on-chip
    # error measurement in every bench JSON — a future default flip can
    # never ship a headline without its measurement attached. One B=2
    # exact-semantics run vs the default-config run from IDENTICAL noise;
    # fails the bench if the mel MSE exceeds the 1e-3 parity bar
    # (BASELINE.md). LEMAS_BENCH_APPROX_GATE=0 skips (probe runs).
    approx_mse: float | None = 0.0
    approx_wav_sc = approx_wav_logmae = None
    if os.environ.get("LEMAS_BENCH_APPROX_GATE", "1") == "0":
        approx_mse = None
    elif CFG_CUTOFF or BLOCK_CACHE:
        from lemas_tts_tpu.eval.metrics import mel_mse, spectral_distance

        gb = 2
        gargs = (params, cond_j[:gb], mask_j[:gb], text[:gb], dur_j[:gb],
                 ys[0][:gb])
        exact = make_sampler(model, SamplerSettings(
            steps=NFE, cfg_strength=CFG, sway_sampling_coef=SWAY))(*gargs)
        approx = run(*gargs)
        approx_mse = float(mel_mse(approx, exact))
        if approx_mse > 1e-3:
            raise RuntimeError(
                f"approximation gate FAILED: default-config sampler diverges "
                f"{approx_mse:.2e} mel MSE from exact semantics (> 1e-3 bar) "
                f"— cfg_cutoff={CFG_CUTOFF} block_cache={BLOCK_CACHE}")

        # waveform-level gate: the mel gate can't see error Vocos amplifies
        # non-uniformly, so decode BOTH mels and compare magnitude STFTs.
        # Bar: spectral convergence ≤ 0.05 (measured round 4 on-chip at the
        # serving defaults: 1.77e-3 sc / 5.1e-3 log-MAE — ~28× headroom;
        # docs/performance.md).
        @jax.jit
        def dec(vp, mel):
            gen = jnp.swapaxes(mel[:, REF_FRAMES:, :], -1, -2)
            gen = jnp.pad(gen, ((0, 0), (0, 0), (0, REF_FRAMES)))
            return voc.apply(vp, gen, frame_mask[:gb], method=Vocos.decode)

        sc, lmae = spectral_distance(dec(vparams, approx), dec(vparams, exact))
        approx_wav_sc, approx_wav_logmae = float(sc), float(lmae)
        wav_bar = float(os.environ.get("LEMAS_BENCH_WAV_SC_GATE", "0.05"))
        if approx_wav_sc > wav_bar:
            raise RuntimeError(
                f"waveform gate FAILED: default-config audio diverges "
                f"{approx_wav_sc:.3f} spectral convergence from exact "
                f"semantics (> {wav_bar:g} bar)")

    # --- quant-divergence gate: when the bench runs quantized (the serving
    # default), the speed row must travel with its measured distance from
    # the bf16 float trajectory — one B=2 exact run in EACH dtype from
    # identical noise, gated at the same 1e-3 parity bar (measured round 5:
    # 4.9e-6 exact / 7.4e-6 at serving defaults — ~100× headroom).
    quant_mse: float | None = None
    if QUANT and os.environ.get("LEMAS_BENCH_APPROX_GATE", "1") != "0":
        from lemas_tts_tpu.eval.metrics import mel_mse

        gb = 2
        data = (cond_j[:gb], mask_j[:gb], text[:gb], dur_j[:gb], ys[0][:gb])
        exact_settings = SamplerSettings(
            steps=NFE, cfg_strength=CFG, sway_sampling_coef=SWAY)
        # the approx gate above already ran this exact quantized-model
        # sampler on the same inputs — reuse instead of re-tracing a full
        # NFE program (minutes of host time per bench through the tunnel)
        exact_q = (exact if (CFG_CUTOFF or BLOCK_CACHE)
                   else make_sampler(model, exact_settings)(params, *data))
        exact_f = make_sampler(fmodel, exact_settings)(fparams, *data)
        quant_mse = float(mel_mse(exact_q, exact_f))
        if quant_mse > 1e-3:
            raise RuntimeError(
                f"quant gate FAILED: {QUANT} sampler diverges "
                f"{quant_mse:.2e} mel MSE from the bf16 trajectory "
                f"(> 1e-3 bar)")

    # --- MFU: analytic sampler FLOPs over the real step schedule (CFG
    # widths, cache skips) / wall / chip bf16 peak (utils/flops.py). The
    # wall includes the vocoder decode (~2%), so reported MFU is slightly
    # conservative. None when the chip's peak is unknown. Stays
    # bf16-peak-normalized under QUANT (int8 MXU peak is higher), so the
    # int8 default's mfu reads as "speedup vs bf16 ideal" and can exceed
    # the bf16 ceiling.
    from lemas_tts_tpu.utils.flops import device_peak_flops, sampler_call_flops

    peak = device_peak_flops()
    sampler_flops = sampler_call_flops(arch, settings, B, N, mel_dim=100)
    mfu = round(sampler_flops / wall / peak, 4) if peak else None

    audio_sec = B * (gen_frames - 1) * HOP / SR
    rtf = audio_sec / wall

    # --- distilled-student row (default-on; LEMAS_BENCH_STUDENT=0 disables)
    student_rtf = student_mse = None
    student_sc = student_logmae = None
    if STUDENT > 0:
        import dataclasses
        import re

        from lemas_tts_tpu.cfm.distill import student_sampler_settings
        from lemas_tts_tpu.eval.metrics import mel_mse

        s_model = model
        if STUDENT_ARCH:
            m = re.fullmatch(r"h(\d+)d(\d+)", STUDENT_ARCH)
            if not m:
                raise ValueError(
                    f"LEMAS_BENCH_STUDENT_ARCH must look like 'h8d128', "
                    f"got {STUDENT_ARCH!r}")
            s_h, s_d = int(m.group(1)), int(m.group(2))
            if s_h * s_d != arch.heads * arch.dim_head:
                raise ValueError(
                    f"student geometry h{s_h}d{s_d} changes the inner dim "
                    f"({s_h * s_d} != {arch.heads * arch.dim_head}) — the "
                    f"param tree would no longer match the teacher weights")
            s_model = DiT(arch=dataclasses.replace(arch, heads=s_h,
                                                   dim_head=s_d),
                          mel_dim=100, text_num_embeds=898,
                          compute_dtype=compute_dtype,
                          attn_backend=default_backend(), quant=QUANT,
                          scan_unroll=UNROLL)
        s_run = make_sampler(s_model, student_sampler_settings(STUDENT, SWAY))

        def s_synth(y):
            mel = s_run(params, cond_j, mask_j, text, dur_j, y)
            return float(vocode_sum(vparams, mel))

        s_synth(ys[0])  # warmup / compile
        s_times = []
        for i in range(1, 6):
            t0 = time.perf_counter()
            s_synth(ys[i])
            s_times.append(time.perf_counter() - t0)
        student_rtf = round(audio_sec / float(np.median(s_times)), 3)
        gb = 2
        gargs = (params, cond_j[:gb], mask_j[:gb], text[:gb], dur_j[:gb],
                 ys[0][:gb])
        s_mel, t_mel = s_run(*gargs), run(*gargs)
        student_mse = float(mel_mse(s_mel, t_mel))
        if os.environ.get("LEMAS_BENCH_APPROX_GATE", "1") != "0":
            # waveform gate for the student path (VERDICT r4 item 1): decode
            # both trajectories, compare magnitude STFTs. Random-weight
            # calibration (same stamp as the approx gate): measured on-chip
            # round 5 at K=8/h8d128 vs the NFE=32/CFG=2 serving-default
            # teacher: student_wav_sc 0.0112 / log-MAE 0.0131 — the 0.3 bar
            # is ~27× headroom (same margin policy as the 0.05 approx-gate
            # bar over its 1.77e-3), so sampler-path regressions (broken
            # geometry math, wrong step schedule, double guidance) fail
            # loudly while honest trajectory distance passes.
            from lemas_tts_tpu.eval.metrics import spectral_distance

            @jax.jit
            def s_dec(vp, mel):
                gen = jnp.swapaxes(mel[:, REF_FRAMES:, :], -1, -2)
                gen = jnp.pad(gen, ((0, 0), (0, 0), (0, REF_FRAMES)))
                return voc.apply(vp, gen, frame_mask[:gb], method=Vocos.decode)

            ssc, slmae = spectral_distance(s_dec(vparams, s_mel),
                                           s_dec(vparams, t_mel))
            student_sc, student_logmae = float(ssc), float(slmae)
            s_bar = float(os.environ.get("LEMAS_BENCH_STUDENT_SC_GATE", "0.3"))
            if student_sc > s_bar:
                raise RuntimeError(
                    f"student gate FAILED: K={STUDENT} student trajectory "
                    f"diverges {student_sc:.3f} spectral convergence from "
                    f"the teacher (> {s_bar:g} bar) — student sampler path "
                    f"regression")

    out = {
        "metric": f"rtf_per_chip_nfe{NFE}",
        "value": round(rtf, 3),
        "unit": "audio_sec/wall_sec",
        "vs_baseline": round(rtf / 20.0, 3),
        "batch": BATCH,
        "cfg_cutoff": CFG_CUTOFF,
        "block_cache": BLOCK_CACHE,
        "quant": QUANT,
        "quant_mel_mse_vs_bf16": quant_mse,
        "approx_mel_mse": approx_mse,
        "approx_wav_sc": approx_wav_sc,
        "approx_wav_logmae": approx_wav_logmae,
        "mfu": mfu,
        "kernel_check": kernel_check,
    }
    # what the approximation-default error bars were calibrated on
    # (config.SERVING_DEFAULTS_EVIDENCE; "random-weights" until
    # validate_assets.py re-probes with real checkpoints)
    from lemas_tts_tpu.config import SERVING_DEFAULTS_EVIDENCE

    out["approx_calibration"] = SERVING_DEFAULTS_EVIDENCE["calibration"]
    if student_rtf is not None:
        out["student_nfe"] = STUDENT
        out["student_rtf"] = student_rtf
        out["student_mel_mse_vs_teacher"] = student_mse
        out["student_wav_sc"] = student_sc
        out["student_wav_logmae"] = student_logmae
        if STUDENT_ARCH:
            out["student_arch"] = STUDENT_ARCH
    print(json.dumps(out))


if __name__ == "__main__":
    # The benchmarking tunnel occasionally drops a request mid-run; one
    # re-exec with a fresh backend recovers it. Attempts are capped via env
    # so a real regression still fails loudly.
    attempt = int(os.environ.get("LEMAS_BENCH_ATTEMPT", "0"))
    try:
        main()
    except Exception:
        import sys
        import traceback

        traceback.print_exc()
        if attempt >= 2:
            raise
        os.environ["LEMAS_BENCH_ATTEMPT"] = str(attempt + 1)
        print(f"bench attempt {attempt + 1} failed — retrying", file=sys.stderr)
        os.execv(sys.executable, [sys.executable] + sys.argv)
