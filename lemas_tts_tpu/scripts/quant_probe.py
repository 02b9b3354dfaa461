"""Int8-vs-bf16 sampler divergence + speed probe (the SERVING_QUANT evidence).

Round-1 measured W8A8 int8 (``ops/quant.py``) as a speed LOSS at B=1 on the
pre-layout-fix kernels and it shipped as a memory-only mode; the round-5
re-probe on the current kernel stack (layout-pinning attention/ffn kernels,
block cache, CFG cutoff) measured +19-35% end-to-end, at a trajectory
divergence 20x below the error the block-cache serving default already
accepts — which made int8 the serving default (``config.SERVING_QUANT``,
evidence table in docs/performance.md). This probe reproduces both halves:

- quality: one exact-noise sampler run per dtype per mode (exact semantics
  AND the serving approximations), mel MSE + rel-L2 between the int8 and
  bf16 trajectories, at both head geometries (flagship h16/d64 and the
  wide-head h8/d128 student split);
- speed (``--speed``): best-of-N sampler wall per dtype at the probe shape.

Accepts ``--ckpt`` so ``scripts/validate_assets.py`` can re-run the grid on
real checkpoints (the random-weights calibration caveat applies to every
approximation default — trajectory-divergence scale can shift on trained
weights). Reference hot loop this accelerates: ``cfm.py:456`` NFE x 2 x 22
block forwards, all ``nn.Linear`` matmuls.

Usage::

    python -m lemas_tts_tpu.scripts.quant_probe               # quality grid
    python -m lemas_tts_tpu.scripts.quant_probe --speed       # + wall clock
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from types import SimpleNamespace

import numpy as np

import jax
import jax.numpy as jnp


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt", default="", help="checkpoint (blank: random)")
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=22)
    ap.add_argument("--geometries", nargs="*", default=None,
                    help="HxD head splits to probe (default: 16x64 + 8x128 "
                         "at the flagship dim; just --heads/--dim_head "
                         "when a model geometry is given)")
    # non-flagship checkpoint geometry (same convention as the other
    # probes; validate_assets passes these through --probe_args)
    ap.add_argument("--heads", type=int, default=None)
    ap.add_argument("--dim_head", type=int, default=None)
    ap.add_argument("--mel_dim", type=int, default=None)
    ap.add_argument("--vocab", type=int, default=None)
    ap.add_argument("--text_dim", type=int, default=None)
    ap.add_argument("--conv_layers", type=int, default=None)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--nfe", type=int, default=32)
    ap.add_argument("--cfg", type=float, default=2.0)
    ap.add_argument("--sway", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--quant", default="int8", choices=["int8", "int8_ff"],
                    help="quantization mode to probe against bf16")
    ap.add_argument("--speed", action="store_true",
                    help="also time the sampler per dtype (best of --reps)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    from lemas_tts_tpu.cfm.sampler import (SamplerSettings,
                                           block_cache_fields, make_sampler)
    from lemas_tts_tpu.config import SERVING_BLOCK_CACHE, SERVING_CFG_CUTOFF
    from lemas_tts_tpu.eval.metrics import mel_mse
    from lemas_tts_tpu.ops.quant import FF_QUANT_NAMES, quantize_dense_tree
    from lemas_tts_tpu.scripts._probe_common import probe_model_and_inputs

    qnames = FF_QUANT_NAMES if args.quant == "int8_ff" else None

    modes = {
        "exact": {},
        "serving": dict(
            cfg_cutoff=SERVING_CFG_CUTOFF,
            **block_cache_fields(SERVING_BLOCK_CACHE, args.depth)),
    }
    if args.geometries is not None:
        geoms = [tuple(int(x) for x in s.split("x")) for s in args.geometries]
    elif args.heads is not None:
        geoms_d = args.dim_head or args.dim // args.heads
        geoms = [(args.heads, geoms_d)]
    else:
        geoms = [(16, 64), (8, 128)]
    for H, D in geoms:
        ns = SimpleNamespace(ckpt=args.ckpt or None, dim=args.dim,
                             depth=args.depth, heads=H, dim_head=D,
                             seed=args.seed, batch=args.batch, n=args.n,
                             mel_dim=args.mel_dim, vocab=args.vocab,
                             text_dim=args.text_dim,
                             conv_layers=args.conv_layers)
        model, params, inputs = probe_model_and_inputs(ns)
        qmodel = dataclasses.replace(model, quant=args.quant)
        qparams = jax.block_until_ready(jax.jit(
            lambda p: quantize_dense_tree(p, names=qnames))(params))
        for tag, kw in modes.items():
            st = SamplerSettings(steps=args.nfe, cfg_strength=args.cfg,
                                 sway_sampling_coef=args.sway, **kw)
            runs = {"bf16": (make_sampler(model, st), params),
                    "int8": (make_sampler(qmodel, st), qparams)}
            mels = {}
            for name, (fn, p) in runs.items():
                mels[name] = jax.block_until_ready(fn(p, *inputs))
            mf = mels["bf16"].astype(jnp.float32)
            mq = mels["int8"].astype(jnp.float32)
            rec = {"geometry": f"h{H}d{D}", "mode": tag, "quant": args.quant,
                   "mel_mse_int8_vs_bf16": float(mel_mse(mq, mf)),
                   "rel_l2": round(float(jnp.linalg.norm(mq - mf)
                                         / jnp.linalg.norm(mf)), 6)}
            if args.speed:
                for name, (fn, p) in runs.items():
                    best = float("inf")
                    for _ in range(args.reps):
                        t0 = time.perf_counter()
                        jax.block_until_ready(fn(p, *inputs))
                        best = min(best, time.perf_counter() - t0)
                    rec[f"{name}_wall_s"] = round(best, 4)
                rec["speedup"] = round(rec["bf16_wall_s"]
                                       / rec["int8_wall_s"], 4)
            print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
