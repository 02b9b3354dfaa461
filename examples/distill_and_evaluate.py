"""Distill a CFM checkpoint to few-step sampling, then score the students.

End-to-end workflow (runs hermetically on random weights at tiny scale;
point --teacher/--config at real assets for production use):

  1. progressive distillation 32→16→8 via ``scripts/distill.py`` machinery
     (CFG baked in at the first stage → single forward per step);
  2. sample the same utterance with the teacher (NFE 32, CFG) and each
     student (``SamplerSettings(steps=K, cfg_strength=0)``);
  3. report mel MSE / MCD of each student against the teacher output with
     ``eval.metrics`` — the objective proxy for distillation quality.

    python examples/distill_and_evaluate.py [--steps_per_stage 200]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps_per_stage", type=int, default=50)
    p.add_argument("--stages", type=str, default="16,8")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from lemas_tts_tpu.cfm.distill import Distiller, student_sampler_settings
    from lemas_tts_tpu.cfm.sampler import SamplerSettings, make_sampler
    from lemas_tts_tpu.config import DiTArch, TrainConfig
    from lemas_tts_tpu.eval.metrics import mcd, mel_mse
    from lemas_tts_tpu.models.dit import DiT
    from lemas_tts_tpu.scripts.train import synthetic_dataset

    arch = DiTArch(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2,
                   text_dim=32, conv_layers=1, dropout=0.0)
    dit = DiT(arch=arch, mel_dim=16, text_num_embeds=26)
    rng = np.random.default_rng(args.seed)
    teacher = dit.init(jax.random.key(0), jnp.zeros((1, 8, 16)),
                       jnp.zeros((1, 8, 16)), jnp.zeros((1, 4), jnp.int32),
                       jnp.zeros((1,)))

    data = synthetic_dataset(32, mel_dim=16, vocab_size=26, seed=args.seed)

    def batches():
        while True:
            idx = rng.integers(0, len(data), 4)
            T = 64
            mel = np.zeros((4, T, 16), np.float32)
            lens = np.zeros(4, np.int32)
            text = np.full((4, 12), -1, np.int32)
            for j, i in enumerate(idx):
                t = min(T, len(data[i]["mel"]))
                mel[j, :t] = data[i]["mel"][:t]
                lens[j] = t
                tt = min(12, len(data[i]["text"]))
                text[j, :tt] = data[i]["text"][:tt]
            yield {"mel": jnp.asarray(mel), "mel_lengths": jnp.asarray(lens),
                   "text": jnp.asarray(text)}

    gen = batches()
    stages = [int(s) for s in args.stages.split(",")]
    students = {}
    t_params = teacher
    for si, k in enumerate(stages):
        d = Distiller(dit, k, cfg=TrainConfig(learning_rate=1e-4,
                                              num_warmup_updates=5),
                      teacher_cfg_strength=(2.0 if si == 0 else 0.0),
                      sway_sampling_coef=1.0)
        state = d.init_state(t_params)
        m = None
        for step in range(args.steps_per_stage):
            state, m = d.distill_step(state, next(gen),
                                      jax.random.key(1000 * si + step))
        loss_txt = f"{float(m['loss']):.4f}" if m is not None else "n/a (0 steps)"
        print(f"stage NFE={k}: final loss {loss_txt}")
        t_params = state.ema_params
        students[k] = t_params

    # --- score the students against the teacher's NFE-32 output
    B, N = 1, 64
    cond = np.zeros((B, N, 16), np.float32)
    cond[:, :16] = rng.standard_normal((B, 16, 16)) * 0.5
    cond_mask = np.zeros((B, N), bool)
    cond_mask[:, :16] = True
    text = jnp.asarray(rng.integers(0, 26, (B, 8)).astype(np.int32))
    dur = jnp.asarray(np.full(B, N, np.int32))
    y0 = jnp.asarray(rng.standard_normal((B, N, 16)).astype(np.float32))
    argv = (jnp.asarray(cond), jnp.asarray(cond_mask), text, dur, y0)

    ref_run = make_sampler(dit, SamplerSettings(steps=32, cfg_strength=2.0,
                                                sway_sampling_coef=1.0))
    ref = np.asarray(ref_run(teacher, *argv))
    for k, params in students.items():
        run = make_sampler(dit, student_sampler_settings(k, 1.0))
        out = np.asarray(run(params, *argv))
        print(f"student NFE={k} ({k}x1 forwards vs 32x2): "
              f"mel_mse={float(mel_mse(ref, out)):.4f} "
              f"mcd={mcd(ref[0], out[0]):.2f} dB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
