"""Measure the cfg_cutoff speed/quality trade on fixed noise.

The opt-in ``cfg_cutoff`` (``cfm/sampler.py:SamplerSettings.cfg_cutoff``)
skips the unconditional half of the CFG forward once the reference's decaying
scale ``cfg_strength·(1−t)²`` (``lemas_tts/model/cfm.py:420``) falls below the
threshold. How much that saves depends entirely on the sway warp: the
canonical CLI grid (NFE=64, sway 3 → ``t**4``, ``cfm/sampler.py:
warped_time_grid``) is front-loaded, so most STEPS sit at small ``t`` where
the scale is near-full and only the last few steps are skippable. This probe
makes both sides of the trade measurable on one command:

- speed: the active-step count (exact, host-side math) and the implied
  model-forward cost ratio vs full CFG;
- quality: mel MSE / relative L2 of the truncated trajectory vs the full-CFG
  trajectory from the SAME noise, reference frames, and text.

Runs at flagship geometry on the real chip by default (random init — the
deviation is a trajectory-divergence scale, not a perceptual score; pass
``--ckpt`` to measure on a converted reference checkpoint, load semantics per
``lemas_tts/infer/utils_infer.py:204-246``). ``--dim/--depth/--heads`` shrink
it for CPU tests.

    python -m lemas_tts_tpu.scripts.cutoff_probe --nfe 64 --cfg 5.0 \
        --sway 3.0 --cutoffs 0.25,1.0,2.0
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--nfe", type=int, default=64)
    p.add_argument("--cfg", type=float, default=5.0)
    p.add_argument("--sway", type=float, default=3.0,
                   help="sway coefficient (canonical CLI: 3.0; bench: 1.0)")
    p.add_argument("--cutoffs", type=str, default="0.25,1.0,2.0",
                   help="comma-separated cfg_cutoff values to probe")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--n", type=int, default=1024, help="mel-frame bucket")
    p.add_argument("--ckpt", type=str, default=None,
                   help="optional reference checkpoint (.pt/.safetensors)")
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
    return p


def run_probe(args) -> list[dict]:
    import jax
    import jax.numpy as jnp

    from lemas_tts_tpu.cfm.sampler import (SamplerSettings, make_sampler,
                                           sway_time_grid)
    from lemas_tts_tpu.eval.metrics import mel_mse
    from lemas_tts_tpu.scripts._probe_common import probe_model_and_inputs

    model, params, inputs = probe_model_and_inputs(args)

    grid = sway_time_grid(args.nfe, args.sway)

    def sample(cutoff):
        s = SamplerSettings(steps=args.nfe, cfg_strength=args.cfg,
                            sway_sampling_coef=args.sway, cfg_cutoff=cutoff)
        mel = np.asarray(jax.block_until_ready(
            make_sampler(model, s)(params, *inputs)))
        return mel, s.cfg_active_steps(grid)

    full, total = sample(None)
    scale = float(np.mean(np.square(full)))
    records = []
    for cutoff in (float(c) for c in args.cutoffs.split(",") if c):
        mel, active = sample(cutoff)
        mse = float(mel_mse(jnp.asarray(mel), jnp.asarray(full)))
        rec = {
            "cutoff": cutoff,
            "active_steps": active,
            "total_steps": total,
            # model forwards: 2 per CFG step, 1 per truncated step
            "fwd_cost_ratio": round((2 * active + (total - active))
                                    / (2 * total), 4),
            "mel_mse": mse,
            "rel_l2": round(float(np.sqrt(mse / max(scale, 1e-20))), 6),
            "max_abs": round(float(np.max(np.abs(mel - full))), 6),
        }
        records.append(rec)
        print(json.dumps(rec))
    return records


def main(argv=None):
    run_probe(build_argparser().parse_args(argv))


if __name__ == "__main__":
    main()
