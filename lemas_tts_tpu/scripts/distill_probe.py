"""Probe progressive distillation at flagship geometry on-chip.

Distillation is this framework's declared lever past the hardware-bound
per-step ceiling (docs/performance.md): the cutoff/block-cache trades got
measured probe grids, and this gives the 32→16→8 chain (``cfm/distill.py``)
the same treatment at REAL model size, which toy-geometry unit tests
(``tests/test_distill.py``) cannot. Quality here is **teacher-relative** —
the student's K-step trajectory vs the teacher's full-NFE CFG trajectory
from identical noise — so random-init weights are meaningful (the probe is
about whether the distillation mechanism closes the step-halving gap at
flagship scale, not about audio quality; re-run with ``--ckpt`` on real
weights before shipping a distilled student).

Per stage it reports:

- ``mse_init``: divergence of the UNtrained student (= teacher weights
  sampled at K steps without CFG) — the gap distillation must close;
- ``mse_trained``: the same divergence after ``--steps`` optimizer steps
  (EMA weights), plus the loss curve endpoints;
- ``speedup``: measured student-sampler wall vs the full teacher sampler
  (the FLOP-side ``fwd_ratio`` is exact host math).

    python -m lemas_tts_tpu.scripts.distill_probe \\
        --stages 16,8 --steps 300 --batch_frames 4000 --lr 1e-4

No reference equivalent (the reference is inference-only,
``lemas_tts/model/cfm.py``).
"""

from __future__ import annotations

import argparse
import json
import time


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--teacher_nfe", type=int, default=32)
    p.add_argument("--cfg", type=float, default=2.0,
                   help="teacher CFG strength baked in at stage 1")
    p.add_argument("--sway", type=float, default=1.0)
    p.add_argument("--stages", type=str, default="16,8")
    p.add_argument("--steps", type=int, default=300,
                   help="optimizer steps per stage")
    p.add_argument("--batch_frames", type=int, default=4000,
                   help="frame budget per distill batch (flagship training "
                        "uses 40000; the probe trades batch for steps)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--synthetic", type=int, default=256,
                   help="synthetic training samples (40-300 frames each)")
    p.add_argument("--batch", type=int, default=2, help="probe eval batch")
    p.add_argument("--n", type=int, default=1024, help="probe eval bucket")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--depth", type=int, default=22)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--student_heads", type=int, default=0,
                   help="student head count (0 = same geometry as teacher); "
                        "8 with --student_dim_head 128 probes the wide-head "
                        "geometry (+14%% e2e, scripts/widehead_probe.py) — "
                        "heads·dim_head must equal the teacher inner dim so "
                        "the param tree is identical (teacher-copy init)")
    p.add_argument("--student_dim_head", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lemas_tts_tpu.cfm.data import DataLoader
    from lemas_tts_tpu.cfm.distill import Distiller, student_sampler_settings
    from lemas_tts_tpu.cfm.sampler import (
        SamplerSettings,
        make_sampler,
        sway_time_grid,
    )
    from lemas_tts_tpu.config import TrainConfig
    from lemas_tts_tpu.eval.metrics import mel_mse
    from lemas_tts_tpu.scripts._probe_common import probe_model_and_inputs
    from lemas_tts_tpu.scripts.train import synthetic_dataset

    model, teacher_params, inputs = probe_model_and_inputs(args)
    if jax.devices()[0].platform != "tpu":
        # CPU smoke runs: the CPU dot thunk can't execute bf16×bf16 grads
        model = model.clone(compute_dtype=jnp.float32)
    # optional wide-head student geometry (same param tree, different
    # runtime head split — cfm/distill.py student_model contract)
    s_model = None
    if args.student_heads:
        import dataclasses

        inner = model.arch.heads * model.arch.dim_head
        sh, sd = args.student_heads, args.student_dim_head or (
            inner // args.student_heads)
        if sh * sd != inner:
            raise SystemExit(f"student geometry h{sh}d{sd} != inner {inner}")
        s_model = model.clone(arch=dataclasses.replace(
            model.arch, heads=sh, dim_head=sd))
        print(json.dumps({"student_geometry": f"h{sh}d{sd}"}))
    # f32 master weights: the probe's random params come back bf16 (fine for
    # inference probes), but optimizer updates at probe lr would vanish in
    # bf16's ~0.8% relative resolution — training needs f32 masters (the
    # model still computes in bf16 internally).
    teacher_params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), teacher_params)
    mel_dim = 100

    def timed(fn, *a):
        out = np.asarray(jax.block_until_ready(fn(*a)))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return out, best

    # the trajectory every stage is scored against: full teacher NFE + CFG
    ref_settings = SamplerSettings(steps=args.teacher_nfe,
                                   cfg_strength=args.cfg,
                                   sway_sampling_coef=args.sway)
    ref_mel, t_teacher = timed(make_sampler(model, ref_settings),
                               teacher_params, *inputs)
    scale = float(np.mean(np.square(ref_mel)))
    print(json.dumps({"teacher_nfe": args.teacher_nfe, "cfg": args.cfg,
                      "time_s": round(t_teacher, 4)}))

    tcfg = TrainConfig(learning_rate=args.lr,
                       num_warmup_updates=max(1, args.steps // 20),
                       batch_size_per_gpu=args.batch_frames)
    dataset = synthetic_dataset(args.synthetic, mel_dim, 898, args.seed)
    loader = DataLoader(dataset, tcfg, seed=args.seed)

    teacher = teacher_params
    stages = [int(s) for s in args.stages.split(",") if s.strip()]
    records = []
    for si, k in enumerate(stages):
        s_settings = student_sampler_settings(k, args.sway)
        sample_k = make_sampler(s_model or model, s_settings)

        def divergence(params):
            mel = np.asarray(jax.block_until_ready(sample_k(params, *inputs)))
            mse = float(mel_mse(jnp.asarray(mel), jnp.asarray(ref_mel)))
            return mse

        distiller = Distiller(
            # after stage 0 the teacher IS the previous (possibly wide)
            # student — its forward must use that geometry
            (model if si == 0 else (s_model or model)), k, cfg=tcfg,
            teacher_cfg_strength=(args.cfg if si == 0 else 0.0),
            sway_sampling_coef=args.sway,
            student_model=s_model,
        )
        state = distiller.init_state(teacher)
        mse_init = divergence(state.params)

        loss0 = loss_last = None
        step = 0
        t0 = time.time()
        for epoch in range(10**9):
            for batch in loader.epoch(args.seed + 997 * si + epoch):
                if step >= args.steps:
                    break
                state, metrics = distiller.distill_step(
                    state, batch, jax.random.key(31_000_000 * (si + 1) + step))
                step += 1
                if step == 1:
                    loss0 = float(metrics["loss"])
                elif step == args.steps:
                    loss_last = float(metrics["loss"])
            if step >= args.steps:
                break
        train_s = time.time() - t0

        ema = jax.tree_util.tree_map(lambda x: x, state.ema_params)
        mse_trained = divergence(ema)
        _, t_student = timed(sample_k, ema, *inputs)

        # exact forward-count ratio: teacher pays 2 forwards on every CFG
        # step; the student pays K single passes
        grid = sway_time_grid(args.teacher_nfe, args.sway)
        teacher_fwds = 2 * ref_settings.cfg_active_steps(grid) + (
            args.teacher_nfe - ref_settings.cfg_active_steps(grid))
        rec = {
            "stage": k,
            "mse_init": mse_init,
            "mse_trained": mse_trained,
            "rel_l2_trained": round(float(np.sqrt(
                mse_trained / max(scale, 1e-20))), 6),
            "loss_first": loss0,
            "loss_last": loss_last,
            "steps": step,
            "train_s": round(train_s, 1),
            "time_s": round(t_student, 4),
            "speedup_vs_teacher": round(t_teacher / t_student, 3),
            "fwd_ratio": round(teacher_fwds / k, 2),
        }
        records.append(rec)
        print(json.dumps(rec))
        teacher = ema  # chain: this stage's EMA student teaches the next
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
