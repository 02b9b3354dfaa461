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
    p.add_argument("--quant", default="default",
                   help="'default' = config.SERVING_QUANT (matches "
                        "serve_http), 'int8' explicit, 'none' = float")
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
    p.add_argument("--stream", type=int, default=0,
                   help="stream-mode probe: synthesize this many text chunks "
                        "via Synthesizer.synthesize_stream and report TTFB + "
                        "steady-state RTF vs the serial and fully-batched "
                        "paths (0 = off; ignores --qps/--requests)")
    p.add_argument("--chunk_batch", type=int, default=2,
                   help="stream-mode mini-batch size (chunks per sampler "
                        "call)")
    p.add_argument("--ttfb_nfe", type=int, default=0,
                   help="stream-mode first-chunk NFE ramp for the "
                        "ttfb-optimized row (0 = same NFE as --nfe)")
    p.add_argument("--first_chunk_chars", type=int, default=40,
                   help="ttfb-optimized row: re-split chunk 0 to this many "
                        "chars (0 disables the re-split)")
    p.add_argument("--secs", type=float, default=30.0,
                   help="measurement window (open loop)")
    p.add_argument("--requests", type=int, default=16,
                   help="request count (closed loop)")
    p.add_argument("--loaded_ttfb", action="store_true",
                   help="loaded-TTFB probe (the product-SLO number): mix "
                        "open-loop Poisson batched traffic at --qps with "
                        "--loaded_streams concurrent streams (the serve_http "
                        "stream cap) and report stream TTFB p50/p99 next to "
                        "batched p50/p99")
    p.add_argument("--loaded_streams", type=int, default=2,
                   help="concurrent stream clients in --loaded_ttfb mode "
                        "(serve_http --max_streams default: 2)")
    p.add_argument("--stream_think", type=float, default=0.0,
                   help="mean exponential think time (s) between a stream "
                        "worker's streams in --loaded_ttfb mode; 0 = "
                        "back-to-back (at-cap saturation — batched latency "
                        "is then queue-bound by construction)")
    p.add_argument("--seed", type=int, default=0)
    return p


def _stream_probe(tts, ref, sr, ref_units, gen_units, cfg, args) -> int:
    """Stream-mode probe: TTFB + steady-state RTF of the double-buffered
    ``Synthesizer.synthesize_stream`` vs (a) a serial per-mini-batch loop
    (the round-2 behavior: fetch batch i fully before dispatching i+1) and
    (b) one fully-batched ``synthesize_chunks`` call over all chunks.

    The claim under test (docs/serving.md): TTFB ≈ one mini-batch sampler
    call, steady-state ≈ the batched path. Reference streaming mode:
    ``utils_infer.py:559-570`` (which is serial and unbatched)."""
    import time as _time

    chunks = [gen_units[i % len(gen_units)] for i in range(args.stream)]
    synth, cb = tts.synth, max(1, args.chunk_batch)

    def run_stream():
        marks, audio = [], []
        t0 = _time.perf_counter()
        for wave, wsr in synth.synthesize_stream(
                ref, sr, ref_units, chunks, cfg=cfg, seed=args.seed,
                chunk_batch=cb):
            marks.append(_time.perf_counter() - t0)
            audio.append(wave.shape[-1] / wsr)
        return marks, audio

    def run_serial():
        # round-2 semantics: one blocking synthesize_chunks per mini-batch
        marks, audio = [], []
        t0 = _time.perf_counter()
        for i in range(0, len(chunks), cb):
            waves, wsr, _ = synth.synthesize_chunks(
                ref, sr, ref_units, chunks[i:i + cb], cfg=cfg,
                seed=args.seed, return_parts=True)
            for w in waves:
                marks.append(_time.perf_counter() - t0)
                audio.append(w.shape[-1] / wsr)
        return marks, audio

    def run_batched():
        t0 = _time.perf_counter()
        waves, wsr, _ = synth.synthesize_chunks(
            ref, sr, ref_units, chunks, cfg=cfg, seed=args.seed,
            return_parts=True)
        wall = _time.perf_counter() - t0
        return wall, sum(w.shape[-1] / wsr for w in waves)

    def report(tag, marks, audio):
        total, wall = sum(audio), marks[-1]
        # steady-state excludes the first mini-batch (pipeline fill)
        k = min(cb, len(audio))
        steady = (sum(audio[k:]) / (wall - marks[k - 1])
                  if len(audio) > k else float("nan"))
        print(f"[stream] {tag}: ttfb={marks[0]:.3f}s total={total:.1f}s "
              f"audio in {wall:.2f}s = {total / wall:.1f}x RT "
              f"(steady-state {steady:.1f}x)")
        return total / wall

    def run_stream_ttfb():
        # TTFB-optimized stream (the serve_http /tts_stream defaults):
        # first mini-batch is ONE short chunk in its own small duration
        # bucket, optionally at a lower NFE; steady state = the plain stream
        import dataclasses

        from lemas_tts_tpu.infer.pipeline import chunk_text

        fcfg = (dataclasses.replace(cfg, nfe_steps=args.ttfb_nfe)
                if args.ttfb_nfe else None)
        tchunks = list(chunks)
        if args.first_chunk_chars > 0 and isinstance(tchunks[0], str) \
                and len(tchunks[0]) > args.first_chunk_chars:
            tchunks = chunk_text(tchunks[0],
                                 max_chars=args.first_chunk_chars) + tchunks[1:]
        marks, audio = [], []
        t0 = _time.perf_counter()
        for wave, wsr in synth.synthesize_stream(
                ref, sr, ref_units, tchunks, cfg=cfg, seed=args.seed,
                chunk_batch=cb, first_chunk_batch=1, first_chunk_cfg=fcfg):
            marks.append(_time.perf_counter() - t0)
            audio.append(wave.shape[-1] / wsr)
        return marks, audio

    print(f"[stream] {len(chunks)} chunks, chunk_batch={cb}, "
          f"nfe={args.nfe}, block_cache={cfg.block_cache!r}, "
          f"cfg_cutoff={cfg.cfg_cutoff!r}, ttfb_nfe={args.ttfb_nfe or args.nfe}")
    print("[stream] warming buckets ...", flush=True)
    run_stream()       # compile every (duration-bucket, chunk_batch) program
    run_stream_ttfb()  # compile the B=1 first-chunk bucket (+ramp settings)
    run_batched()      # compile the full-batch bucket the one-call path uses
    report("stream (ttfb-optimized) ", *run_stream_ttfb())
    report("stream (double-buffered)", *run_stream())
    report("serial  (round-2 loop)  ", *run_serial())
    wall, total = run_batched()
    print(f"[stream] batched (one call)  : total={total:.1f}s audio in "
          f"{wall:.2f}s = {total / wall:.1f}x RT")
    return 0


def _loaded_ttfb_probe(tts, ref, sr, ref_units, gen_units, texts, cfg,
                       args) -> int:
    """TTFB under load (VERDICT r4 item 3): the 0.198 s warm/solo/unloaded
    figure stands in for a product SLO — this measures the real one. An
    open-loop Poisson batched workload drives the ``ServingEngine`` at
    ``--qps`` while ``--loaded_streams`` concurrent clients run
    serve_http-equivalent streams (first-chunk prioritization, B=1 first
    bucket, optional ``--ttfb_nfe`` ramp) back-to-back on request threads —
    exactly the contention ``serve_http`` produces at its stream cap.
    Reports stream TTFB p50/p99 and batched p50/p99 side by side."""
    import dataclasses

    from lemas_tts_tpu.infer.pipeline import chunk_text
    from lemas_tts_tpu.serve.engine import ServingEngine, TTSRequest

    synth = tts.synth
    eng = ServingEngine(synth, cfg=cfg, max_batch=args.max_batch)
    stream_text = " ".join(texts)
    chunks = [c for c in chunk_text(stream_text, max_chars=60)]
    fc = args.first_chunk_chars
    if fc > 0 and len(chunks[0]) > fc:
        chunks = chunk_text(chunks[0], max_chars=fc) + chunks[1:]
    s_units = [tts.prepare_units(c) for c in chunks]
    fcfg = (dataclasses.replace(cfg, nfe_steps=args.ttfb_nfe)
            if args.ttfb_nfe else None)
    cb = max(1, args.chunk_batch)

    def make_req(i):
        return TTSRequest(ref_wav=ref, ref_sr=sr, ref_units=ref_units,
                          gen_units=gen_units[i % len(gen_units)],
                          seed=args.seed + i)

    def one_stream(seed):
        t0 = time.perf_counter()
        gen = synth.synthesize_stream(
            ref, sr, ref_units, s_units, cfg=cfg, seed=seed,
            chunk_batch=cb, first_chunk_batch=1, first_chunk_cfg=fcfg)
        first = next(gen, None)
        ttfb = time.perf_counter() - t0
        for _ in gen:  # drain: streams occupy the device like real clients
            pass
        return ttfb, (0.0 if first is None
                      else first[0].shape[-1] / sr)

    try:
        # warm every (duration bucket × batch bucket) program the load phase
        # can produce: open-loop collection yields every batch size
        # 1..max_batch, each padded to a batch bucket — a shape missed here
        # compiles mid-measurement (~25-100 s via the tunnel) and poisons
        # the percentiles (first on-chip run measured batched p50 78 s, all
        # compile stall)
        from lemas_tts_tpu.infer.pipeline import (BATCH_BUCKETS,
                                                  TEXT_BUCKETS, pick_bucket)
        from lemas_tts_tpu.utils.vocab import text_to_ids

        # one warm rep per (duration bucket, TEXT bucket): the engine
        # batches by duration bucket only, and nt = pick_bucket(max ids)
        # varies with batch composition — warming just the first text per
        # duration bucket leaves the other nt-bucket programs to compile
        # mid-measurement
        rep_by_bucket = {}
        for i, g in enumerate(gen_units):
            b = synth.estimate_bucket(ref, sr, ref_units, g, cfg)
            full = (ref_units + g if isinstance(g, str)
                    else list(ref_units) + list(g))
            nt = pick_bucket(len(text_to_ids(full, synth.vocab)),
                             TEXT_BUCKETS)
            rep_by_bucket.setdefault((b, nt), i)
        # up to the bucket a full max_batch collection PADS INTO (a
        # non-bucket max_batch like 6 pads to 8)
        top = pick_bucket(args.max_batch, BATCH_BUCKETS)
        b_buckets = tuple(b for b in BATCH_BUCKETS if b <= top)
        print(f"[loaded] warming (dur,nt)={sorted(rep_by_bucket)} "
              f"B={list(b_buckets)} via the dispatch path ...", flush=True)
        # warm through the REAL dispatch path (synthesize_requests), not a
        # synthetic reconstruction: jit cache keys include argument
        # commitment/sharding, so only the path itself reliably warms the
        # path (a jnp.zeros stand-in re-traced the full sampler at first
        # real dispatch through the tunnel — the measured ~10 s TTFB tail)
        for b, i in sorted(rep_by_bucket.items()):
            for k in b_buckets:
                synth.synthesize_requests(
                    [dict(ref_wav=ref, ref_sr=sr, ref_units=ref_units,
                          gen_units=gen_units[i], seed=args.seed + j)
                     for j in range(k)], cfg=cfg)
        for i in range(len(gen_units)):  # every text through the engine
            eng.submit(make_req(i)).result(timeout=1800)
        one_stream(args.seed)  # stream buckets incl. the B=1 first chunk

        stop = threading.Event()
        lock = threading.Lock()
        batched, ttfbs, shed = [], [], [0]

        def stream_worker(wid):
            s = args.seed + 1000 * (wid + 1)
            srng = np.random.default_rng(args.seed + wid)
            while not stop.is_set():
                ttfb, _ = one_stream(s)
                s += 1
                with lock:
                    ttfbs.append(ttfb)
                if args.stream_think > 0:
                    stop.wait(float(srng.exponential(args.stream_think)))

        def fire(i):
            t0 = time.perf_counter()
            try:
                eng.submit(make_req(i)).result(timeout=600)
            except RuntimeError:
                with lock:
                    shed[0] += 1
                return
            with lock:
                batched.append(time.perf_counter() - t0)

        workers = [threading.Thread(target=stream_worker, args=(w,),
                                    daemon=True)
                   for w in range(max(1, args.loaded_streams))]
        for w in workers:
            w.start()
        print(f"[loaded] {args.loaded_streams} streams + Poisson "
              f"{args.qps} req/s for {args.secs}s", flush=True)
        rng = np.random.default_rng(args.seed)
        firers, i = [], 0
        t_end = time.time() + args.secs
        while time.time() < t_end:
            th = threading.Thread(target=fire, args=(i,), daemon=True)
            th.start()
            firers.append(th)
            i += 1
            time.sleep(float(rng.exponential(1.0 / max(args.qps, 1e-9))))
        stop.set()
        for th in firers:
            th.join(timeout=600)
        for w in workers:
            w.join(timeout=600)

        if ttfbs:
            ps = _percentiles(ttfbs)
            print(f"[loaded] stream TTFB ms: p50={ps['p50_ms']:.0f} "
                  f"p90={ps['p90_ms']:.0f} p99={ps['p99_ms']:.0f} "
                  f"max={ps['max_ms']:.0f} (n={ps['count']})")
        if batched:
            pb = _percentiles(batched)
            print(f"[loaded] batched ms:     p50={pb['p50_ms']:.0f} "
                  f"p90={pb['p90_ms']:.0f} p99={pb['p99_ms']:.0f} "
                  f"max={pb['max_ms']:.0f} (n={pb['count']}, "
                  f"shed={shed[0]})")
        print(f"[loaded] engine stats: {eng.stats()['latency']}")
    finally:
        eng.shutdown()
    return 0


def main() -> int:
    args = build_parser().parse_args()

    import lemas_tts_tpu
    from lemas_tts_tpu.config import SamplerConfig
    from lemas_tts_tpu.serve.engine import ServingEngine, TTSRequest

    from lemas_tts_tpu.config import resolve_quant

    tts = lemas_tts_tpu.TTS(model=args.model, ckpt_file=args.ckpt,
                            vocab_file=args.vocab,
                            quantization=resolve_quant(args.quant))
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
    if args.loaded_ttfb:
        return _loaded_ttfb_probe(tts, ref, sr, ref_units, gen_units, texts,
                                  cfg, args)
    if args.stream > 0:
        return _stream_probe(tts, ref, sr, ref_units, gen_units, cfg, args)
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
