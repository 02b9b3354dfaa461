"""Continuous-batching serving example.

Spins up a long-lived ServingEngine, warms the shape buckets, and submits
concurrent requests from client threads. Without pretrained assets it runs
on random weights to demonstrate the flow (see docs/serving.md).

    python examples/serving.py [--ckpt ... --vocab ...] [--requests 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="multilingual", help="config name or yaml path")
    p.add_argument("--ckpt", default="", help="CFM checkpoint (torch or orbax)")
    p.add_argument("--vocab", default="", help="vocab.txt")
    p.add_argument("--requests", type=int, default=8)
    p.add_argument("--nfe", type=int, default=32)
    p.add_argument("--max_batch", type=int, default=4)
    args = p.parse_args()

    import lemas_tts_tpu
    from lemas_tts_tpu.config import SamplerConfig
    from lemas_tts_tpu.serve.engine import ServingEngine, TTSRequest

    sr = 24000
    t = np.arange(2 * sr) / sr
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)
           * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)

    tts = lemas_tts_tpu.TTS(model=args.model, ckpt_file=args.ckpt, vocab_file=args.vocab)
    cfg = SamplerConfig(nfe_steps=args.nfe)
    print("[serving] warming shape buckets (first compiles happen here, "
          "not in request latency)...")
    # warm the (duration, batch, text) buckets these requests actually land
    # in — default warmup covers only (1024, B=1, nt=256) and a mismatched
    # warmup leaves every batch cold
    tts.synth.warmup(cfg, duration_buckets=(512, 768, 1024),
                     batch_buckets=(args.max_batch,),
                     text_buckets=(64, 128))
    eng = ServingEngine(tts.synth, cfg=cfg, max_batch=args.max_batch)

    texts = [
        "the first client request.",
        "a second, slightly longer client request arrives concurrently.",
        "short one.",
        "and a fourth request to fill the batch window.",
    ]

    def run_round(label):
        t0 = time.time()
        futs = [
            eng.submit(TTSRequest(ref_wav=ref, ref_sr=sr,
                                  ref_units="some call me nature.",
                                  gen_units=texts[i % len(texts)]))
            for i in range(args.requests)
        ]
        total_audio = 0.0
        for i, f in enumerate(futs):
            out = f.result()
            wave = out[0] if isinstance(out, tuple) else out
            total_audio += np.asarray(wave).shape[-1] / sr
        dt = time.time() - t0
        print(f"[serving] {label}: {args.requests} requests, "
              f"{total_audio:.1f}s audio in {dt:.1f}s — "
              f"{total_audio / max(dt, 1e-9):.2f}x RT aggregate")

    # first round pays residual one-time compiles (exact ref-mel length,
    # vocoder slicing); the second round is the steady state a server runs at
    run_round("cold round")
    run_round("steady state")
    print(f"[serving] stats: {eng.stats()}")
    eng.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
