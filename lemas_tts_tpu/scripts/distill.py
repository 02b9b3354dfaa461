"""Progressive-distillation CLI: bake CFG + halve NFE, stage by stage.

No reference equivalent (the reference is inference-only); this is the
framework's documented path past the hardware-bound per-step ceiling
(docs/performance.md): a student distilled 32→16→8 runs the sampler with
``steps=8, cfg_strength=0`` — 8× fewer DiT forwards than NFE-32 CFG.

  python -m lemas_tts_tpu.scripts.distill --config multilingual \
      --teacher ckpts/run1 --stages 16,8 --steps_per_stage 2000 \
      --data manifest.jsonl --ckpt_dir ckpts/distilled

Teacher sources: an orbax training dir (scripts/train.py output), a native
orbax array tree (infer/checkpoints.save_native), or a torch
``.pt``/``.safetensors`` checkpoint (converted on the fly, EMA remap
included). Each stage writes ``<ckpt_dir>/stage_<K>`` with the stage's EMA
student; sample the result via ``SamplerSettings(steps=K, cfg_strength=0)``
(``cfm.distill.student_sampler_settings``).
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Distill the CFM sampler to few steps.")
    p.add_argument("--config", type=str, default="multilingual")
    p.add_argument("--vocab_file", type=str, default="")
    p.add_argument("--teacher", type=str, required=True,
                   help="Orbax train dir, native .npz, or torch ckpt.")
    p.add_argument("--stages", type=str, default="16,8",
                   help="Comma-separated student NFE per stage (halving chain).")
    p.add_argument("--steps_per_stage", type=int, default=2000)
    p.add_argument("--teacher_cfg", type=float, default=2.0,
                   help="CFG strength baked in during the FIRST stage.")
    p.add_argument("--sway", type=float, default=1.0)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--data", type=str, default="", help="JSONL manifest path.")
    p.add_argument("--synthetic", type=int, default=0,
                   help="Use N synthetic samples (smoke runs/CI).")
    p.add_argument("--ckpt_dir", type=str, required=True)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--block_cache", type=str, default="",
                   help="probed block-cache spec to record in student.json "
                        "(from scripts/student_stack_probe.py — "
                        "apply_student_settings then opts the cache back in "
                        "for this student; empty = cache disabled, the safe "
                        "default)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_file", type=str, default="")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--tiny", action="store_true",
                   help="Tiny arch override (hermetic smoke distillation).")
    p.add_argument("--student_heads", type=int, default=0,
                   help="Student attention head count (0 = teacher's). With "
                        "--student_dim_head it must keep heads*dim_head — "
                        "the wide-head geometry h8/d128 is +14%% e2e RTF "
                        "(scripts/widehead_probe.py).")
    p.add_argument("--student_dim_head", type=int, default=0,
                   help="Student head dim (0 = teacher's).")
    return p


def load_teacher(path: str):
    """Resolve a teacher DiT param tree from any supported source: an orbax
    training dir (prefers the EMA weights, like inference does), a native
    orbax array tree, or a torch checkpoint (EMA remap included)."""
    import os

    from lemas_tts_tpu.infer.checkpoints import load_cfm_checkpoint, load_native

    if os.path.isdir(path):
        sub = os.path.join(path, "model_last")
        restored = load_native(sub if os.path.isdir(sub) else path)
        if isinstance(restored, dict) and "ema_params" in restored:
            ema = restored["ema_params"]
            return ema if ema is not None else restored["params"]["dit"]
        return restored  # a bare param tree saved with save_native
    return load_cfm_checkpoint(path)["dit"]


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    from lemas_tts_tpu.cfm.data import DataLoader
    from lemas_tts_tpu.cfm.distill import Distiller
    from lemas_tts_tpu.config import DiTArch, TrainConfig, load_model_config
    from lemas_tts_tpu.infer.checkpoints import save_native
    from lemas_tts_tpu.models.dit import DiT
    from lemas_tts_tpu.parallel.distributed import initialize, is_primary
    from lemas_tts_tpu.parallel.mesh import make_mesh
    from lemas_tts_tpu.scripts.train import load_manifest, synthetic_dataset
    from lemas_tts_tpu.utils.profiling import JsonLogger
    from lemas_tts_tpu.utils.vocab import Vocab, get_tokenizer

    initialize()
    log = JsonLogger(path=args.log_file or None)

    cfg = load_model_config(args.config)
    tcfg = TrainConfig(
        learning_rate=args.lr,
        num_warmup_updates=max(1, args.steps_per_stage // 20),
        batch_size_per_gpu=(2000 if args.tiny else TrainConfig().batch_size_per_gpu),
    )
    if args.vocab_file:
        vocab = get_tokenizer(args.vocab_file, "custom")
    else:
        vocab = Vocab(char_map={chr(97 + i): i for i in range(26)}, size=26)

    if args.tiny:
        arch = DiTArch(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                       text_dim=16, conv_layers=1, dropout=0.0)
        mel_dim = 8
    else:
        arch = cfg.arch
        mel_dim = cfg.mel_spec.n_mel_channels

    if args.synthetic:
        dataset = synthetic_dataset(args.synthetic, mel_dim, vocab.size, args.seed)
    elif args.data:
        dataset = load_manifest(args.data, vocab)
    else:
        print("need --data or --synthetic", file=sys.stderr)
        return 2

    n_dev = jax.device_count()
    mesh = (make_mesh(n_dev, model_parallel=args.model_parallel)
            if n_dev > 1 else None)
    dit = DiT(arch=arch, mel_dim=mel_dim, text_num_embeds=vocab.size)
    # wide-head student geometry: same parameter tree (heads·dim_head
    # preserved), different runtime head split — the nhd attention kernel
    # runs one full-depth d128 chain per 128-lane program instead of two
    # lane-masked d64 chains (+14% e2e sampler RTF measured on v5e,
    # scripts/widehead_probe.py)
    student_arch = None
    if args.student_heads or args.student_dim_head:
        import dataclasses

        s_heads = args.student_heads or arch.heads
        s_dh = args.student_dim_head or arch.dim_head
        if s_heads * s_dh != arch.heads * arch.dim_head:
            print(f"--student_heads*--student_dim_head must equal the "
                  f"teacher inner dim {arch.heads * arch.dim_head} "
                  f"(got {s_heads}*{s_dh})", file=sys.stderr)
            return 2
        student_arch = dataclasses.replace(arch, heads=s_heads, dim_head=s_dh)
    student_dit = (DiT(arch=student_arch, mel_dim=mel_dim,
                       text_num_embeds=vocab.size)
                   if student_arch is not None else None)
    loader = DataLoader(
        dataset, tcfg, seed=args.seed,
        batch_multiple=(mesh.shape["data"] if mesh is not None else 1),
    )

    teacher = load_teacher(args.teacher)

    stages = [int(s) for s in args.stages.split(",") if s.strip()]

    for si, k in enumerate(stages):
        # first stage bakes the teacher's CFG in; later teachers (previous
        # students) are already guided and run single-pass (strength 0).
        # A geometry change applies at stage 0; from stage 1 on the teacher
        # (= previous student) already runs the student geometry.
        distiller = Distiller(
            (dit if si == 0 or student_dit is None else student_dit), k,
            cfg=tcfg,
            teacher_cfg_strength=(args.teacher_cfg if si == 0 else 0.0),
            sway_sampling_coef=args.sway, mesh=mesh,
            student_model=student_dit,
        )
        state = distiller.init_state(teacher)
        t0 = time.time()
        step = 0  # host-side mirror of state.step: avoids a device→host
        # sync per step so async dispatch pipelines the next launch
        for epoch in range(10**9):
            for batch in loader.epoch(args.seed + 101 * si + epoch):
                if step >= args.steps_per_stage:
                    break
                state, metrics = distiller.distill_step(
                    state, batch, jax.random.key(7_000_000 * (si + 1) + step)
                )
                step += 1
                if is_primary() and (step % args.log_every == 0
                                     or step == args.steps_per_stage):
                    log.log("distill_step", stage=k, step=step,
                            loss=float(metrics["loss"]),
                            sps=step / max(time.time() - t0, 1e-9))
            if step >= args.steps_per_stage:
                break
        teacher = jax.tree_util.tree_map(lambda x: x, state.ema_params)
        out = f"{args.ckpt_dir}/stage_{k}"
        if is_primary():
            save_native(teacher, out)
            # student metadata: lets TTS / serve_http auto-apply the baked
            # sampler settings when loading this directory (api.py reads it)
            import json
            from pathlib import Path

            meta = {
                "student_steps": k,
                "cfg_strength": 0.0,
                "sway_sampling_coef": args.sway,
                "teacher": args.teacher,
                "teacher_cfg_strength": args.teacher_cfg,
                "stage_index": si,
                "steps_per_stage": args.steps_per_stage,
            }
            if student_arch is not None:
                # geometry override: api.py rebuilds the DiT with these
                # before loading the stage weights (identical param tree)
                meta["arch"] = {"heads": student_arch.heads,
                                "dim_head": student_arch.dim_head}
            if args.block_cache:
                from lemas_tts_tpu.cfm.sampler import parse_block_cache

                if parse_block_cache(args.block_cache) is None:
                    raise SystemExit(
                        f"--block_cache {args.block_cache!r} is not a valid "
                        "spec")
                # probed stacking spec (student_stack_probe) — consumed by
                # TTS.apply_student_settings, which otherwise disables the
                # NFE-32-calibrated serving cache for students
                meta["block_cache"] = args.block_cache
            Path(out, "student.json").write_text(json.dumps(meta, indent=1))
            log.log("stage_done", stage=k, path=out)
        print(f"[distill] stage NFE={k} done → {out} "
              f"(sample with steps={k}, cfg_strength=0)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
