"""Measure the block-range residual cache's speed/quality trade.

``SamplerSettings.block_cache_range`` (``cfm/sampler.py``) is the
training-free DiT acceleration of the DeepCache/Δ-DiT family: on refresh
steps the full 22-block stack runs and the aggregate residual of blocks
``[lo, hi)`` is stored; on the other steps that range collapses to one cached
add (sequential deltas telescope). The reference has no equivalent — its
sampler (``lemas_tts/model/cfm.py:382-425``) pays every block on every
``odeint`` step.

This probe makes both sides measurable on one command, for a grid of
(range, refresh period):

- speed: the analytic block-cost ratio (exact host-side math) AND measured
  wall-clock speedup vs the uncached sampler on the same shapes;
- quality: mel MSE / relative L2 vs the uncached trajectory from the SAME
  noise, reference frames, and text (random init by default — a
  trajectory-divergence scale, not a perceptual score; ``--ckpt`` runs a
  converted reference checkpoint).

    python -m lemas_tts_tpu.scripts.blockcache_probe \
        --nfe 32 --cfg 2.0 --sway 1.0 --specs 2-14:2,2-20:3+t6
"""

from __future__ import annotations

import argparse
import json
import time


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--nfe", type=int, default=32)
    p.add_argument("--cfg", type=float, default=2.0)
    p.add_argument("--sway", type=float, default=1.0)
    p.add_argument("--cfg_cutoff", type=float, default=None,
                   help="compose with CFG truncation (serving default 0.5)")
    p.add_argument("--specs", type=str, default="2-14:2,6-18:2,4-20:2,4-20:3",
                   help="comma-separated block-cache specs "
                        "('lo-hi:every[+hN][+tN]', parse_block_cache)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n", type=int, default=1024, help="mel-frame bucket")
    p.add_argument("--reps", type=int, default=3,
                   help="timing repetitions (best-of after warmup)")
    p.add_argument("--no_time", action="store_true",
                   help="skip wall-clock timing (quality only)")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--depth", type=int, default=22)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mel_dim", type=int, default=100,
                   help="mel channels (non-flagship checkpoints)")
    p.add_argument("--vocab", type=int, default=898,
                   help="text_num_embeds (non-flagship checkpoints)")
    p.add_argument("--dim_head", type=int, default=None,
                   help="head dim (default: flagship 64, or dim//heads for "
                        "small probes; 128 probes the wide-head student "
                        "geometry)")
    p.add_argument("--text_dim", type=int, default=512)
    p.add_argument("--conv_layers", type=int, default=4)
    p.add_argument("--quant", type=str, default="",
                   help="probe at a W8A8 serving dtype ('int8'/'int8_ff'; "
                        "blank = bf16 — specs chosen at bf16 should be "
                        "re-validated under the int8 serving default)")
    p.add_argument("--pick_mse", type=float, default=None,
                   help="also print the fastest probed spec whose mel MSE "
                        "is within this budget (one-command calibration "
                        "for a new checkpoint/settings combo)")
    return p


def run_probe(args) -> list[dict]:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lemas_tts_tpu.cfm.sampler import SamplerSettings, make_sampler
    from lemas_tts_tpu.eval.metrics import mel_mse
    from lemas_tts_tpu.scripts._probe_common import probe_model_and_inputs

    model, params, inputs = probe_model_and_inputs(args)
    B, N = args.batch, args.n
    ref = min(188, N // 4)

    def build(spec):
        from lemas_tts_tpu.cfm.sampler import block_cache_fields

        s = SamplerSettings(steps=args.nfe, cfg_strength=args.cfg,
                            sway_sampling_coef=args.sway,
                            cfg_cutoff=args.cfg_cutoff,
                            **block_cache_fields(spec, args.depth))
        return s, make_sampler(model, s)

    def measure(fn):
        mel = np.asarray(jax.block_until_ready(fn(params, *inputs)))
        if args.no_time:
            return mel, float("nan")
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(params, *inputs))
            best = min(best, time.perf_counter() - t0)
        return mel, best

    full, t_full = measure(build(None)[1])
    scale = float(np.mean(np.square(full)))
    records = []
    from lemas_tts_tpu.cfm.sampler import sway_time_grid

    grid = sway_time_grid(args.nfe, args.sway)
    for spec in (s for s in args.specs.split(",") if s):
        settings, fn = build(spec)
        if settings.block_cache_range is None:
            # spec clamped to disabled at this depth/method — a no-op run
            print(json.dumps({"spec": spec, "disabled": True}))
            continue
        mel, t = measure(fn)
        mse = float(mel_mse(jnp.asarray(mel), jnp.asarray(full)))
        # MCD (dB) on the generated region — a cepstral (more perceptual)
        # view of the same deviation; <0.3 dB is inaudible by convention
        from lemas_tts_tpu.eval.metrics import mcd
        mcd_db = float(np.mean([
            mcd(mel[i, ref:], full[i, ref:]) for i in range(B)]))
        # exact average block count per velocity call from the real flag
        # schedule (warm head/tail windows AND the forced refresh at the
        # CFG-truncation 2B→B boundary, mirroring _scan_block_cached)
        from lemas_tts_tpu.cfm.sampler import block_cache_flags

        flags = block_cache_flags(settings, args.nfe)
        k = settings.cfg_active_steps(grid)
        if settings.use_cfg and k < args.nfe:
            flags[k] = True
        lo, hi = settings.block_cache_range
        skipped = (hi - lo) * float(np.mean(~flags))
        rec = {
            "spec": spec,
            "block_cost_ratio": round((args.depth - skipped) / args.depth, 4),
            "mel_mse": mse,
            "mcd_db": round(mcd_db, 4),
            "rel_l2": round(float(np.sqrt(mse / max(scale, 1e-20))), 6),
            "time_s": round(t, 4),
            "speedup": (round(t_full / t, 4) if not args.no_time else None),
        }
        records.append(rec)
        print(json.dumps(rec))
    print(json.dumps({"spec": "none", "time_s": round(t_full, 4),
                      "speedup": 1.0, "mel_mse": 0.0}))
    if args.pick_mse is not None:
        ok = [r for r in records
              if not r.get("disabled") and r["mel_mse"] <= args.pick_mse]
        key = ((lambda r: r["speedup"]) if not args.no_time
               else (lambda r: -r["block_cost_ratio"]))
        pick = max(ok, key=key) if ok else None
        print(json.dumps({"picked": pick["spec"] if pick else None,
                          "budget_mse": args.pick_mse}))
    return records


def main(argv=None):
    run_probe(build_argparser().parse_args(argv))


if __name__ == "__main__":
    raise SystemExit(main())
