"""Serving latency probe: measure request-latency percentiles under load.

Drives a live ``ServingEngine`` (the same runtime ``serve_http`` mounts) with
either a closed loop (one request at a time — the single-stream floor) or an
open loop (Poisson arrivals at ``--qps``), and prints a latency table:
p50/p90/p99 submit→result per request plus aggregate real-time factor.

The reference has no serving latency story at all (its Gradio app rebuilds
the model per request, ``inference_gradio.py:270-271``); this probe is how
the numbers in docs/serving.md were measured.

    python -m lemas_tts_tpu.scripts.latency_probe --nfe 32 --qps 2 --secs 30
"""

from __future__ import annotations

import argparse
import threading
import time

import numpy as np


def _percentiles(xs):
    # the engine's nearest-rank formula — this probe prints its own table AND
    # the engine's /stats table on the last line; two different rank formulas
    # would read as a measurement discrepancy
    from lemas_tts_tpu.serve.engine import ServingEngine

    return ServingEngine._percentiles(xs)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="multilingual")
    p.add_argument("--ckpt", default="", help="checkpoint (blank: random init)")
    p.add_argument("--vocab", default="", help="vocab.txt (blank: byte tokenizer)")
    p.add_argument("--nfe", type=int, default=32)
    p.add_argument("--cfg_strength", type=float, default=2.0)
    p.add_argument("--cfg_cutoff", type=float, default=-1.0,
                   help="CFG truncation; <0 = serving default "
                        "(config.SERVING_CFG_CUTOFF), 0 = exact full CFG")
    p.add_argument("--block_cache", type=str, default="default",
                   help="block-cache spec 'lo-hi:every[+hN][+tN]'; 'default' "
                        "= config.SERVING_BLOCK_CACHE, '0' = off")
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--qps", type=float, default=0.0,
                   help="open-loop arrival rate; 0 = closed loop (B=1 floor)")
    p.add_argument("--secs", type=float, default=30.0,
                   help="measurement window (open loop)")
    p.add_argument("--requests", type=int, default=16,
                   help="request count (closed loop)")
    p.add_argument("--seed", type=int, default=0)
    return p


def main() -> int:
    args = build_parser().parse_args()

    import lemas_tts_tpu
    from lemas_tts_tpu.config import SamplerConfig
    from lemas_tts_tpu.serve.engine import ServingEngine, TTSRequest

    tts = lemas_tts_tpu.TTS(model=args.model, ckpt_file=args.ckpt,
                            vocab_file=args.vocab)
    sr = tts.target_sample_rate
    t = np.arange(4 * sr) / sr
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)
           * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    ref_units = tts.prepare_units("some call me nature, others call me "
                                  "mother nature.")
    texts = [
        "i have been a silent spectator, watching species evolve.",
        "the quick brown fox jumps over the lazy dog near the river bank.",
        "synthesis latency is measured from submit to result future.",
        "a shorter request.",
    ]
    gen_units = [tts.prepare_units(s) for s in texts]

    from lemas_tts_tpu.cfm.sampler import parse_block_cache
    from lemas_tts_tpu.config import SERVING_BLOCK_CACHE, SERVING_CFG_CUTOFF

    cutoff = SERVING_CFG_CUTOFF if args.cfg_cutoff < 0 else (args.cfg_cutoff
                                                             or None)
    bc = SERVING_BLOCK_CACHE if args.block_cache == "default" else args.block_cache
    bc = bc if parse_block_cache(bc) is not None else None
    cfg = SamplerConfig(nfe_steps=args.nfe, cfg_strength=args.cfg_strength,
                        cfg_cutoff=cutoff, block_cache=bc)
    eng = ServingEngine(tts.synth, cfg=cfg, max_batch=args.max_batch)

    def make_req(i):
        return TTSRequest(ref_wav=ref, ref_sr=sr, ref_units=ref_units,
                          gen_units=gen_units[i % len(gen_units)],
                          seed=args.seed + i)

    try:
        # warmup: cover every (duration, text) bucket the request mix lands
        # in, at batch 1..max_batch (open-loop batches vary), so measured
        # latency is steady-state, not compile time
        print("[latency] warming buckets ...", flush=True)
        for i in range(len(gen_units)):
            eng.submit(make_req(i)).result(timeout=1800)
        futs = [eng.submit(make_req(i)) for i in range(args.max_batch)]
        for f in futs:
            f.result(timeout=1800)

        lat, audio_s = [], []
        t_start = time.time()
        if args.qps <= 0:
            print(f"[latency] closed loop: {args.requests} requests")
            for i in range(args.requests):
                t0 = time.perf_counter()
                out = eng.submit(make_req(i)).result(timeout=600)
                lat.append(time.perf_counter() - t0)
                audio_s.append(np.asarray(out[0]).shape[-1] / sr)
        else:
            print(f"[latency] open loop: {args.qps} req/s for {args.secs}s")
            rng = np.random.default_rng(args.seed)
            done = []
            lock = threading.Lock()

            def fire(i):
                t0 = time.perf_counter()
                try:
                    out = eng.submit(make_req(i)).result(timeout=600)
                except RuntimeError as e:  # queue full → count as shed load
                    with lock:
                        done.append((None, 0.0, str(e)))
                    return
                dt = time.perf_counter() - t0
                with lock:
                    done.append((dt, np.asarray(out[0]).shape[-1] / sr, ""))

            threads, i = [], 0
            t_end = time.time() + args.secs
            while time.time() < t_end:
                th = threading.Thread(target=fire, args=(i,), daemon=True)
                th.start()
                threads.append(th)
                i += 1
                time.sleep(float(rng.exponential(1.0 / args.qps)))
            for th in threads:
                th.join(timeout=600)
            shed = sum(1 for d in done if d[0] is None)
            lat = [d[0] for d in done if d[0] is not None]
            audio_s = [d[1] for d in done if d[0] is not None]
            if shed:
                print(f"[latency] shed (queue-full 503): {shed}")
        wall = time.time() - t_start

        if not lat:
            # every open-loop request shed, or --requests 0: there is no
            # latency table, but the shed count above already told the story
            print("[latency] no completed requests — nothing to report")
        else:
            pct = _percentiles(lat)  # seconds in, *_ms out (engine formula)
            print(f"[latency] latency ms: p50={pct['p50_ms']:.0f} "
                  f"p90={pct['p90_ms']:.0f} p99={pct['p99_ms']:.0f} "
                  f"max={pct['max_ms']:.0f} (n={pct['count']})")
        print(f"[latency] aggregate: {sum(audio_s):.1f}s audio in "
              f"{wall:.1f}s = {sum(audio_s) / max(wall, 1e-9):.1f}x RT")
        print(f"[latency] engine stats: {eng.stats()['latency']}")
    finally:
        eng.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
