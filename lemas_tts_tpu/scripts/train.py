"""Training CLI: flow-matching CFM training with auto-resume.

The reference only configures training (``configs/*.yaml`` optim section,
commented-out accelerate env) and ships no trainer entry point; this makes
the TPU trainer runnable end-to-end:

  python -m lemas_tts_tpu.scripts.train --config multilingual \
      --data manifest.jsonl --ckpt_dir ckpts/run1

 - data: a JSONL manifest (one ``{"mel": path.npy, "text": "...", "lang": k}``
   per line) or ``--synthetic N`` for a hermetic smoke run;
 - sharding: DP(+optional TP) mesh over all local devices;
 - checkpoints: orbax ``model_<step>``/``model_last`` with the reference save
   policy; ``--resume`` restores the latest state and continues;
 - metrics: JSON-lines to stderr or ``--log_file``.
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time
from typing import Any, Dict, List


def load_manifest(path: str, vocab) -> List[Dict[str, Any]]:
    """JSONL manifest → in-memory dataset (mels memory-mapped)."""
    import numpy as np

    from lemas_tts_tpu.utils.vocab import text_to_ids

    out = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            mel = np.load(rec["mel"], mmap_mode="r")
            tokens = rec["text"].split("|") if "|" in rec["text"] else rec["text"]
            out.append({
                "mel": np.asarray(mel, np.float32),
                "text": text_to_ids(tokens, vocab),
                "lang": int(rec.get("lang", 0)),
                "audio_16k": (np.load(rec["audio_16k"]) if "audio_16k" in rec
                              else None),
                "prosody_idx": rec.get("prosody_idx"),
            })
    return out


def synthetic_dataset(n: int, mel_dim: int, vocab_size: int, seed: int = 0):
    import numpy as np

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        t = int(rng.integers(40, 300))
        out.append({
            "mel": rng.standard_normal((t, mel_dim)).astype(np.float32),
            "text": rng.integers(0, vocab_size, rng.integers(4, 24)).astype(np.int32),
            "lang": int(rng.integers(0, 12)),
        })
    return out


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the CFM/DiT acoustic model.")
    p.add_argument("--config", type=str, default="multilingual")
    p.add_argument("--vocab_file", type=str, default="")
    p.add_argument("--data", type=str, default="", help="JSONL manifest path.")
    p.add_argument("--synthetic", type=int, default=0,
                   help="Use N synthetic samples (smoke runs/CI).")
    p.add_argument("--ckpt_dir", type=str, required=True)
    p.add_argument("--resume", action="store_true",
                   help="Resume from the latest checkpoint in --ckpt_dir.")
    p.add_argument("--steps", type=int, default=0, help="0 → epochs from config.")
    p.add_argument("--epochs", type=int, default=0, help="0 → config value.")
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--pipe_parallel", type=int, default=1,
                   help="GPipe stages over the DiT blocks "
                        "(parallel/pipeline.py); exclusive of "
                        "--model_parallel > 1.")
    p.add_argument("--microbatches", type=int, default=0,
                   help="pipeline microbatches per step (0 → pipe degree)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3-style param/moment/EMA sharding over the "
                        "'data' axis (fully-sharded data parallelism; "
                        "composes with --model_parallel and with "
                        "--pipe_parallel).")
    p.add_argument("--grad_accum", type=int, default=0,
                   help="gradient accumulation mini-steps per optimizer "
                        "update (0 → config value)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_file", type=str, default="")
    p.add_argument("--log_every", type=int, default=10)
    # smoke-scale overrides
    p.add_argument("--tiny", action="store_true",
                   help="Tiny arch override (hermetic smoke training).")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import numpy as np

    from lemas_tts_tpu.cfm.checkpoint import CheckpointManager
    from lemas_tts_tpu.cfm.data import DataLoader
    from lemas_tts_tpu.cfm.train import Trainer, TrainState
    from lemas_tts_tpu.config import DiTArch, TrainConfig, load_model_config
    from lemas_tts_tpu.models.dit import DiT
    from lemas_tts_tpu.parallel.distributed import initialize, is_primary
    from lemas_tts_tpu.parallel.mesh import make_mesh
    from lemas_tts_tpu.utils.profiling import JsonLogger
    from lemas_tts_tpu.utils.vocab import Vocab, get_tokenizer

    if args.microbatches and args.pipe_parallel <= 1:
        print("--microbatches only applies with --pipe_parallel > 1",
              file=sys.stderr)
        return 2

    initialize()  # multi-host no-op when single-process
    log = JsonLogger(path=args.log_file or None)

    cfg = load_model_config(args.config)
    tcfg = TrainConfig(
        epochs=args.epochs or TrainConfig().epochs,
        batch_size_per_gpu=(
            2000 if args.tiny else TrainConfig().batch_size_per_gpu
        ),
        grad_accumulation_steps=(
            args.grad_accum or TrainConfig().grad_accumulation_steps
        ),
    )
    if args.vocab_file:
        vocab = get_tokenizer(args.vocab_file, "custom")
    else:
        vocab = Vocab(char_map={chr(97 + i): i for i in range(26)}, size=26)

    if args.tiny:
        arch = DiTArch(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                       text_dim=16, conv_layers=1)
        mel_dim = 8
    else:
        arch = cfg.arch
        mel_dim = cfg.mel_spec.n_mel_channels

    if args.synthetic:
        dataset = synthetic_dataset(args.synthetic, mel_dim, vocab.size,
                                    args.seed)
    elif args.data:
        dataset = load_manifest(args.data, vocab)
    else:
        print("need --data or --synthetic", file=sys.stderr)
        return 2

    n_dev = jax.device_count()
    dit = DiT(arch=arch, mel_dim=mel_dim, text_num_embeds=vocab.size,
              use_prosody_encoder=cfg.use_prosody_encoder)
    if args.pipe_parallel > 1:
        assert args.model_parallel == 1, (
            "--pipe_parallel composes with data parallelism, not "
            "--model_parallel")
        from lemas_tts_tpu.parallel.pipeline import (PipelinedTrainer,
                                                     make_pipe_mesh)

        mesh = make_pipe_mesh(n_dev, pipe_parallel=args.pipe_parallel)
        microbatches = args.microbatches or args.pipe_parallel
        trainer = PipelinedTrainer(
            dit, vocab_size=vocab.size, mel_dim=mel_dim, cfg=tcfg,
            use_ctc=cfg.use_ctc_loss, mesh=mesh,
            use_prosody=cfg.use_prosody_encoder,
            num_microbatches=microbatches, fsdp=args.fsdp)
        batch_multiple = mesh.shape["data"] * microbatches
    else:
        mesh = (
            make_mesh(n_dev, model_parallel=args.model_parallel)
            if n_dev > 1
            else None
        )
        trainer = Trainer(dit, vocab_size=vocab.size, mel_dim=mel_dim,
                          cfg=tcfg, use_ctc=cfg.use_ctc_loss, mesh=mesh,
                          use_prosody=cfg.use_prosody_encoder,
                          fsdp=args.fsdp)
        batch_multiple = mesh.shape["data"] if mesh is not None else 1
    loader = DataLoader(
        dataset, tcfg, seed=args.seed,
        batch_multiple=batch_multiple,
    )
    mgr = CheckpointManager(args.ckpt_dir, tcfg)

    first = next(iter(loader.epoch(args.seed)))
    state = trainer.init_state(jax.random.key(args.seed), first)
    start_step = 0
    if args.resume:
        try:
            # restore against the freshly-initialized state as the target
            # template so orbax rebuilds optax's NamedTuple structures
            target = {"step": 0, "params": state.params,
                      "ema_params": state.ema_params,
                      "opt_state": state.opt_state}
            restored = mgr.restore(target=target)
            state = TrainState(
                step=jax.numpy.asarray(restored["step"], jax.numpy.int32),
                params=restored["params"],
                opt_state=restored["opt_state"],
                ema_params=restored["ema_params"],
            )
            start_step = int(restored["step"])
            log.log("resumed", step=start_step)
        except FileNotFoundError:
            log.log("resume_requested_but_no_checkpoint")

    host_rng = random.Random(args.seed)
    max_steps = args.steps or (tcfg.epochs * max(1, len(loader)))
    step = start_step
    t0 = time.time()
    for epoch in range(10**9):
        for batch in loader.epoch(args.seed + epoch):
            if step >= max_steps:
                break
            state, metrics = trainer.train_step(
                state, batch, jax.random.key(1000 + step), host_rng
            )
            step = int(state.step)
            # orbax saves of mesh-sharded arrays must run on ALL processes
            # (each host contributes its shards); only logging is primary-only
            mgr.maybe_save(step, state.params, state.ema_params,
                           opt_state=state.opt_state)
            if is_primary():
                if step % args.log_every == 0 or step == max_steps:
                    log.log("train_step", step=step,
                            loss=float(metrics["loss"]),
                            flow=float(metrics["flow_loss"]),
                            sps=step / max(time.time() - t0, 1e-9))
        if step >= max_steps:
            break
    mgr._write(mgr.last_path, {"step": step, "params": state.params,
                               "ema_params": state.ema_params,
                               "opt_state": state.opt_state})
    if is_primary():
        log.log("train_done", step=step)
    print(f"[train] done at step {step} → {args.ckpt_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
