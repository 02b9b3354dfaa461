"""Wide-head geometry probe: h16/d64 (flagship contract) vs h8/d128.

The flagship checkpoint geometry (heads=16, dim_head=64 — reference
``lemas_tts/model/modules.py:442-503`` via config) caps the nhd attention
kernel at ~2× MXU lane waste: each d64 head contracts over half a 128-lane
window, so the score/output matmuls do double the physical MACs, and the
f32 softmax runs once per head. A d128 head fills the window exactly —
full contraction depth, half the softmax rows (``ops/attention.py``
``heads_per_block=1`` path). Same ``dim = heads·dim_head = 1024``, so the
qkv/out projection shapes are identical and a wide-head model has the same
parameter count — this is the measured-candidate *student geometry* for
distillation (docs/training.md), not a drop-in for reference checkpoints.

Two measurements, matching prior probe methodology (CLAUDE.md: standalone
wins can be e2e losses — report both):

1. standalone: in-program ``lax.scan`` reps of the nhd kernel, one scalar
   fetch per timing, at both geometries;
2. e2e: full CFM sampler wall (serving-default approximations optional) on
   flagship-dim random-init DiT at both geometries, audio-s/s per chip.

Usage::

    python -m lemas_tts_tpu.scripts.widehead_probe            # both parts
    python -m lemas_tts_tpu.scripts.widehead_probe --no_e2e   # kernel only
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

SR, HOP = 24000, 256  # bench.py audio-seconds convention


def _bench_kernel(q, k, v, mask, angles, heads, reps: int) -> float:
    from lemas_tts_tpu.ops.attention import vmem_attention_nhd

    @jax.jit
    def run(q, k, v):
        def body(c, _):
            o = vmem_attention_nhd(c, k, v, mask, angles, heads=heads)
            return o.astype(c.dtype), ()

        out, _ = jax.lax.scan(body, q, None, length=reps)
        return jnp.sum(out.astype(jnp.float32))

    float(run(q, k, v))  # compile + warm
    t0 = time.perf_counter()
    float(run(q, k, v))
    return (time.perf_counter() - t0) / reps * 1e6


def standalone(args) -> None:
    dt = jnp.bfloat16
    inner = args.dim
    for spec in args.shapes:
        B, N = (int(x) for x in spec.split("x"))
        rng = np.random.default_rng(0)
        q, k, v = (jnp.asarray(rng.standard_normal((B, N, inner)), dt)
                   for _ in range(3))
        mask = jnp.asarray(np.arange(N)[None] < N - 64).repeat(B, 0)
        times = {}
        for H, D in ((16, 64), (8, 128)):
            from lemas_tts_tpu.ops.rope import rope_angles

            times[D] = _bench_kernel(q, k, v, mask, rope_angles(N, D),
                                     H, args.reps)
        print(json.dumps({
            "shape": spec,
            "d64_us": round(times[64]), "d128_us": round(times[128]),
            "speedup": round(times[64] / times[128], 3)}))


def e2e(args) -> None:
    from types import SimpleNamespace

    from lemas_tts_tpu.cfm.sampler import (SamplerSettings,
                                           block_cache_fields, make_sampler)
    from lemas_tts_tpu.scripts._probe_common import probe_model_and_inputs

    B, N = args.batch, args.n
    ref = min(188, N // 4)
    audio_sec = B * (N - ref - 1) * HOP / SR
    results = {}
    for H, D in ((16, 64), (8, 128)):
        ns = SimpleNamespace(ckpt=None, dim=args.dim, depth=args.depth,
                             heads=H, dim_head=D, seed=args.seed,
                             batch=B, n=N)
        model, params, inputs = probe_model_and_inputs(ns)
        settings = SamplerSettings(
            steps=args.nfe, cfg_strength=args.cfg,
            sway_sampling_coef=args.sway, cfg_cutoff=args.cfg_cutoff,
            **block_cache_fields(args.block_cache or None, args.depth))
        fn = make_sampler(model, settings)
        jax.block_until_ready(fn(params, *inputs))  # compile + warm
        best = float("inf")
        for _ in range(args.reps_e2e):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(params, *inputs))
            best = min(best, time.perf_counter() - t0)
        results[D] = best
        print(json.dumps({
            "geometry": f"h{H}d{D}", "sampler_wall_s": round(best, 4),
            "audio_s_per_s": round(audio_sec / best, 2)}))
    print(json.dumps({
        "e2e_speedup_d128_vs_d64": round(results[64] / results[128], 4),
        "nfe": args.nfe, "batch": B, "n": N,
        "cfg_cutoff": args.cfg_cutoff, "block_cache": args.block_cache}))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--shapes", nargs="*",
                    default=["8x1024", "1x1024", "2x2048", "1x4096"])
    # ≥50 in-scan reps required for a valid ratio: ~20 ms tunnel dispatch
    # overhead pollutes shorter scans and under-reads the kernel speedup
    # (CLAUDE.md round-4 methodology note; the shipped numbers used 100)
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--reps_e2e", type=int, default=3)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=22)
    ap.add_argument("--nfe", type=int, default=32)
    ap.add_argument("--cfg", type=float, default=2.0)
    ap.add_argument("--sway", type=float, default=1.0)
    ap.add_argument("--cfg_cutoff", type=float, default=None)
    ap.add_argument("--block_cache", type=str, default="",
                    help="optional serving spec, e.g. 0-22:2+t2")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no_standalone", action="store_true")
    ap.add_argument("--no_e2e", action="store_true")
    args = ap.parse_args(argv)
    if not args.no_standalone:
        standalone(args)
    if not args.no_e2e:
        e2e(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
