"""Dependency-free HTTP serving endpoint on the continuous-batching engine.

The reference serves only through Gradio (``scripts/inference_gradio.py``);
a production deployment wants a plain HTTP API. Stdlib-only
(``http.server`` with a thread pool — request threads block on engine
futures while the single worker thread drives the TPU, so concurrency maps
directly onto the engine's micro-batching).

Endpoints:
  POST /tts     JSON {"ref_b64": <base64 WAV>, "ref_text": str, "text": str,
                      "seed": int?} → audio/wav bytes
                (or {"ref_path": server-local path} instead of ref_b64).
                Optional per-request sampler overrides: "nfe_step",
                "cfg_strength", "sway_sampling_coef", "speed", "cfg_cutoff",
                "block_cache" ("lo-hi:every" or "0"),
                "ode_method" (the reference's Gradio app exposes NFE/CFG per
                request, ``inference_gradio.py``; the engine batches
                same-settings requests together). "queue_timeout_s" sets an
                engine-side deadline: still queued past it → shed, 504.
                Client disconnects while queued cancel the request
                (docs/serving.md "Overload robustness"); a clean FIN
                counts as disconnect (nginx-style abort detection), so a
                client that half-closes its write side after the body must
                send "half_close": true to keep its request alive.
  POST /tts_stream  same JSON (+ optional "max_chars", "chunk_batch",
                "first_chunk_chars" — chunk-0 re-split size for low TTFB,
                default 40, 0 disables — and "ttfb_nfe" — lower-NFE first
                chunk ramp) →
                chunked ``audio/L16`` PCM, one HTTP chunk per synthesized
                text chunk as it completes (reference streaming mode,
                ``utils_infer.py:559-570``; time-to-first-audio = one
                chunk, not the whole utterance). Runs on the request
                thread via ``Synthesizer.synthesize_stream`` — long
                streams don't stall the micro-batcher queue.
  GET  /healthz → {"ok": true, "queue_depth": N}
  GET  /stats   → engine stats JSON (queue depth, stage timers)
  GET  /config  → live serving defaults (nfe/cfg/cutoff/cache/quant/
                  batch caps/student sidecar/multihost)

Run:  python -m lemas_tts_tpu.scripts.serve_http --port 8080 \
          --ckpt_file ... --vocab_file ...
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import select
import socket
import sys
import threading
import time
import wave as wave_mod
from concurrent.futures import CancelledError
from concurrent.futures import TimeoutError as FuturesTimeout
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence

import numpy as np


def _wav_bytes(wav: np.ndarray, sr: int) -> bytes:
    pcm = (np.clip(np.asarray(wav, np.float32), -1.0, 1.0) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1 if pcm.ndim == 1 else pcm.shape[0])
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.T.tobytes() if pcm.ndim == 2 else pcm.tobytes())
    return buf.getvalue()


def _decode_ref(payload: dict):
    """(wav [T] float32, sr) from ref_b64 WAV bytes or a server-local path."""
    from lemas_tts_tpu.utils.audio_io import read_audio

    if payload.get("ref_b64"):
        raw = base64.b64decode(payload["ref_b64"])
        try:  # native codec handles 16/24/32-bit PCM and float32
            from lemas_tts_tpu.native import audio as native_audio

            decoded = native_audio.wav_decode(raw)
        except Exception:
            decoded = None
        if decoded is not None:
            wav, sr = decoded
            return (wav.mean(axis=0) if wav.ndim == 2 else wav), sr
        with wave_mod.open(io.BytesIO(raw), "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            ch = w.getnchannels()
            width = w.getsampwidth()
            frames = w.readframes(n)
        if width == 2:
            wav = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
        elif width == 4:
            wav = np.frombuffer(frames, dtype="<i4").astype(np.float32) / 2147483648.0
        elif width == 1:  # 8-bit WAV is unsigned
            wav = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported WAV sample width: {width} bytes")
        if ch > 1:
            wav = wav.reshape(-1, ch).mean(axis=1)
        return wav, sr
    if payload.get("ref_path"):
        wav, sr = read_audio(payload["ref_path"])
        if wav.ndim == 2:
            wav = wav.mean(axis=0)
        return wav, sr
    raise ValueError("request needs ref_b64 or ref_path")


# per-request sampler overrides accepted in /tts and /tts_stream payloads
# (recompile-safe: the synthesizer keys its jitted programs on the full
# settings, so a new combination compiles once and is then cached; the engine
# batches same-settings requests together via its composite bucket)
_CFG_FIELDS = {
    # name → (SamplerConfig field, cast, (lo, hi) inclusive range or choices)
    "nfe_step": ("nfe_steps", int, (1, 256)),
    "nfe_steps": ("nfe_steps", int, (1, 256)),
    "cfg_strength": ("cfg_strength", float, (0.0, 20.0)),
    "sway_sampling_coef": ("sway_sampling_coef", float, (-20.0, 20.0)),
    "speed": ("speed", float, (0.1, 10.0)),
    "cfg_cutoff": ("cfg_cutoff", float, (0.0, 100.0)),
    "ode_method": ("ode_method", str, ("euler", "midpoint")),
    # block-range residual cache spec "lo-hi:every" ("0" disables); validated
    # by parse_block_cache below plus a depth bound (a hostile hi can't
    # exceed the 22-block stack, and lo/hi/every are ints so the program
    # space stays tiny)
    "block_cache": ("block_cache", str, None),
}


def _request_cfg(base, payload: dict):
    """SamplerConfig for this request: ``base`` overridden by any recognized
    payload fields, or None when the payload carries no overrides.

    Overrides are range-validated (a hostile ``nfe_step`` would otherwise
    compile an arbitrarily large scan program on the single engine worker —
    a remote DoS) and floats are quantized to 3 decimals so clients sweeping
    noisy float values can't mint unbounded distinct jit programs."""
    import dataclasses

    over = {}
    for key, (field_name, cast, rng) in _CFG_FIELDS.items():
        if key in payload and payload[key] is not None:
            try:
                v = cast(payload[key])
            except (TypeError, ValueError):
                raise ValueError(f"{key!r} must be {cast.__name__}")
            if key == "block_cache":
                from lemas_tts_tpu.cfm.sampler import parse_block_cache

                parsed = parse_block_cache(v)  # raises on malformed specs
                if parsed is not None:
                    (_, hi), every, head, tail = parsed
                    # bound EVERY dimension of the spec: each distinct value
                    # is a distinct frozen SamplerSettings → a fresh XLA
                    # compile on the single engine worker (same compile-DoS
                    # reasoning as the nfe_step cap above)
                    if hi > 64 or every > 8 or head > 64 or tail > 64:
                        raise ValueError("block_cache spec out of range")
                v = v if parsed is not None else None
            elif cast is str:
                if v not in rng:
                    raise ValueError(f"{key!r} must be one of {rng}")
            else:
                lo, hi = rng
                if not (lo <= v <= hi):
                    raise ValueError(f"{key!r} must be in [{lo}, {hi}]")
                if cast is float:
                    v = round(v, 3)
            if field_name in over and over[field_name] != v:
                # aliases (nfe_step/nfe_steps) disagreeing would silently
                # resolve by dict order — reject instead
                raise ValueError(
                    f"conflicting values for {field_name!r} aliases"
                )
            over[field_name] = v
    return dataclasses.replace(base, **over) if over else None


def make_handler(tts, engine, max_streams: int = 2, multihost=None):
    """Bind a handler class over the shared TTS facade + engine.

    ``max_streams`` bounds concurrent /tts_stream requests (they run on
    request threads, outside the micro-batcher) so a burst of streams
    can't starve batched /tts traffic — excess streams get 503, the same
    backpressure contract as the engine's queue-full path.

    ``multihost`` (a ``serve.multihost.MultiHostDispatch`` or None) marks
    multi-process serving: /stats aggregates across processes (with fleet
    liveness); /tts and /tts_stream both broadcast their device dispatches
    to the SPMD followers via the engine's BroadcastSynthesizer.
    """
    from lemas_tts_tpu.serve.engine import TTSRequest

    stream_slots = threading.BoundedSemaphore(max(1, max_streams))
    tts_student = getattr(tts, "student", None)  # student.json sidecar dict

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route through engine logger
            engine.log.log("http", line=(fmt % args))

        def _reply(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_json(self, code: int, obj):
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def _await_or_cancel(self, fut, timeout: float,
                             watch_socket: bool = True):
            """Block on the engine future, watching the client socket: a
            disconnect while queued cancels the request in the engine so
            the device never computes for a vanished client. Like
            mainstream HTTP servers (nginx client-abort detection), a clean
            FIN from the peer counts as a disconnect — HTTP clients don't
            half-close; a client that legitimately shuts down only its
            write side after the body must say so with ``"half_close":
            true`` in the payload (→ ``watch_socket=False``), trading
            abort detection for half-close support (the response write
            still surfaces a dead peer as BrokenPipeError).

            A future that itself FAILED with TimeoutError (engine queue
            shed) is re-raised immediately. ``fut.result``'s wait timeout
            is ``concurrent.futures.TimeoutError`` while the engine stores
            a builtin ``TimeoutError`` — one class only on 3.11+, so both
            are caught explicitly for 3.10."""
            deadline = time.monotonic() + timeout
            while True:
                try:
                    return fut.result(timeout=0.25)
                except (FuturesTimeout, TimeoutError):
                    if fut.done():
                        # distinguish "engine stored a TimeoutError" from
                        # "completed successfully in the wait-timeout race
                        # window": result(timeout=0) returns the value or
                        # re-raises only the STORED exception — never the
                        # wait timeout we just caught
                        return fut.result(timeout=0)
                    if time.monotonic() > deadline:
                        engine.cancel(fut)
                        raise
                if not watch_socket:
                    continue
                readable, _, _ = select.select([self.connection], [], [], 0)
                if readable:
                    try:
                        peek = self.connection.recv(1, socket.MSG_PEEK)
                    except OSError:
                        peek = b""
                    if peek == b"":  # EOF: client hung up while we waited
                        engine.cancel(fut)
                        raise ConnectionResetError(
                            "client disconnected while queued")

        def do_GET(self):
            if self.path == "/healthz":
                degraded = engine.stats().get("degraded")
                self._reply_json(503 if degraded else 200,
                                 {"ok": not degraded,
                                  "degraded": degraded,
                                  "queue_depth": engine.batcher.depth()})
            elif self.path == "/stats":
                stats = engine.stats()
                if multihost is not None:
                    stats["multihost"] = multihost.aggregated_stats()
                self._reply_json(200, stats)
            elif self.path == "/config":
                # ops introspection: the ACTUAL live serving defaults (an
                # SLO regression is unexplainable without knowing which
                # approximations a server runs — quant/cache/cutoff all
                # changed defaults across rounds)
                c = engine.cfg
                self._reply_json(200, {
                    "nfe_steps": c.nfe_steps,
                    "cfg_strength": c.cfg_strength,
                    "sway_sampling_coef": c.sway_sampling_coef,
                    "cfg_cutoff": c.cfg_cutoff,
                    "block_cache": c.block_cache,
                    "ode_method": c.ode_method,
                    "quant": getattr(getattr(tts, "dit", None), "quant",
                                     None),
                    "max_batch": engine.batcher.max_batch,
                    "max_streams": max_streams,
                    "student": tts_student,
                    "multihost": multihost is not None,
                })
            else:
                self._reply_json(404, {"error": "not found"})

        def _stream_tts(self, payload):
            """Sets ``self._stream_headers_sent`` once the 200 is committed
            (after that an error can only abort the connection, never a
            second reply)."""
            import time

            from lemas_tts_tpu.infer.pipeline import chunk_text

            t0 = time.perf_counter()
            ref_wav, ref_sr = _decode_ref(payload)
            ref_text = payload.get("ref_text", "")
            gen_text = payload.get("text", "")
            if not gen_text:
                raise ValueError("request needs non-empty 'text'")
            max_chars = max(1, int(payload.get("max_chars", 135)))
            chunks = [c for part in gen_text.split("\n")
                      for c in chunk_text(part, max_chars=max_chars)]
            # TTFB: re-split chunk 0 so the first sampler call covers a
            # short utterance in a small duration bucket (docs/serving.md
            # "Streaming TTFB"); 0 disables the re-split
            fc_chars = int(payload.get("first_chunk_chars", 40))
            if fc_chars > 0 and chunks and len(chunks[0]) > fc_chars:
                chunks = chunk_text(chunks[0], max_chars=fc_chars) + chunks[1:]
            gen_units = [tts.prepare_units(c) for c in chunks]
            ref_units = tts.prepare_units(ref_text)

            cfg = _request_cfg(engine.cfg, payload) or engine.cfg
            # streams bypass the batcher, but NOT the engine's cap on
            # distinct sampler settings — each combination pins compiled
            # programs for life (RuntimeError → 503 below)
            engine.register_cfg(cfg)
            # optional first-chunk NFE ramp: chunk 0 samples at a lower NFE
            # (faster first audio), the stream continues at the full cfg
            first_cfg = None
            ttfb_nfe = payload.get("ttfb_nfe")
            if ttfb_nfe is not None:
                ttfb_nfe = int(ttfb_nfe)
                if not (1 <= ttfb_nfe <= 256):
                    raise ValueError("'ttfb_nfe' must be in [1, 256]")
                import dataclasses

                first_cfg = dataclasses.replace(cfg, nfe_steps=ttfb_nfe)
                engine.register_cfg(first_cfg)  # same compile-DoS cap
            # engine.synth is the BroadcastSynthesizer under --multihost
            # (each stream mini-batch broadcasts to the SPMD followers);
            # single-process it IS tts.synth
            stream = engine.synth.synthesize_stream(
                ref_wav, ref_sr, ref_units, gen_units,
                cfg=cfg,
                seed=payload.get("seed"),
                chunk_batch=max(1, int(payload.get("chunk_batch", 2))),
                first_chunk_batch=1,
                first_chunk_cfg=first_cfg,
            )
            # pull the first chunk BEFORE committing the 200: synthesis
            # errors still map to a clean JSON error response
            first = next(stream, None)
            if first is None:
                raise ValueError("no synthesizable chunks in 'text'")
            ttfb = time.perf_counter() - t0
            engine.record_latency("stream_ttfb", ttfb)
            sr = int(first[1])
            self.send_response(200)
            self.send_header("Content-Type",
                             f"audio/L16; rate={sr}; channels=1")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            self._stream_headers_sent = True

            def write_chunk(wav):
                pcm = (np.clip(np.asarray(wav, np.float32), -1.0, 1.0)
                       * 32767.0).astype("<i2").tobytes()
                if pcm:
                    self.wfile.write(f"{len(pcm):X}\r\n".encode())
                    self.wfile.write(pcm + b"\r\n")
                    self.wfile.flush()

            n_chunks = 1
            try:
                write_chunk(first[0])
                for wav, _sr in stream:
                    write_chunk(wav)
                    n_chunks += 1
                self.wfile.write(b"0\r\n\r\n")
                outcome = "ok"
            except BaseException:
                outcome = "aborted"
                raise
            finally:
                if engine.trace_requests:
                    from lemas_tts_tpu.utils.profiling import trace_record

                    trace_record(
                        engine.log, "stream_trace",
                        ttfb_ms=round(ttfb * 1e3, 2),
                        n_chunks=n_chunks,
                        total_ms=round((time.perf_counter() - t0) * 1e3, 2),
                        chunk_batch=max(1, int(payload.get("chunk_batch", 2))),
                        outcome=outcome,
                    )

        def do_POST(self):
            if self.path == "/tts_stream":
                if not stream_slots.acquire(blocking=False):
                    self._reply_json(503, {"error": "stream capacity reached"})
                    return
                self._stream_headers_sent = False
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(n) or b"{}")
                    self._stream_tts(payload)
                except (BrokenPipeError, ConnectionResetError):
                    self.close_connection = True  # client hung up mid-stream
                except RuntimeError as e:
                    if self._stream_headers_sent:
                        engine.log.log("stream_aborted", error=str(e))
                        self.close_connection = True
                    else:  # settings cap / capacity → backpressure status
                        self._reply_json(503, {"error": str(e)})
                except Exception as e:
                    if self._stream_headers_sent:
                        # mid-body failure: a second status line would corrupt
                        # the chunked framing — drop the connection so the
                        # client sees a truncated stream, not desynced
                        # keep-alive bytes
                        engine.log.log("stream_aborted", error=str(e))
                        self.close_connection = True
                    else:
                        self._reply_json(400, {"error": str(e)})
                finally:
                    stream_slots.release()
                return
            if self.path != "/tts":
                self._reply_json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                ref_wav, ref_sr = _decode_ref(payload)
                ref_text = payload.get("ref_text", "")
                gen_text = payload.get("text", "")
                if not gen_text:
                    raise ValueError("request needs non-empty 'text'")
                # the same unit preparation TTS.infer uses (a raw text2phn
                # string would be tokenized character-by-character)
                ref_units = tts.prepare_units(ref_text)
                gen_units = tts.prepare_units(gen_text)
                # queue_timeout_s: engine-side deadline — a request still
                # QUEUED past it is shed at dispatch (TimeoutError → 504
                # here) instead of occupying a batch slot under overload
                qt = payload.get("queue_timeout_s")
                # half_close silently disabling disconnect-cancel on a typo'd
                # truthy value ("false", 1) would be a trap — require a bool
                # like the other validated payload fields
                half_close = payload.get("half_close", False)
                if not isinstance(half_close, bool):
                    raise ValueError("'half_close' must be a boolean")
                fut = engine.submit(TTSRequest(
                    ref_wav=ref_wav, ref_sr=ref_sr, ref_units=ref_units,
                    gen_units=gen_units, seed=payload.get("seed"),
                    cfg=_request_cfg(engine.cfg, payload),
                    timeout=float(qt) if qt is not None else None,
                ))
                out = self._await_or_cancel(
                    fut, timeout=float(payload.get("timeout_s", 300)),
                    watch_socket=not half_close)
                wav = out[0] if isinstance(out, tuple) else out
                sr = out[1] if isinstance(out, tuple) and len(out) > 1 \
                    else tts.target_sample_rate
                self._reply(200, _wav_bytes(np.asarray(wav), int(sr)),
                            "audio/wav")
            except (FuturesTimeout, TimeoutError) as e:
                # server capacity, not client fault: retryable 504. The
                # engine sheds with builtin TimeoutError; the wait timeout
                # is concurrent.futures.TimeoutError — distinct on 3.10.
                self._reply_json(504, {"error": f"synthesis timed out: {e}"})
            except CancelledError:
                self._reply_json(503, {"error": "request cancelled"})
            except (BrokenPipeError, ConnectionResetError):
                self.close_connection = True  # client already gone
            except RuntimeError as e:  # queue full → backpressure status
                self._reply_json(503, {"error": str(e)})
            except Exception as e:
                self._reply_json(400, {"error": str(e)})

    return Handler


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="HTTP TTS serving endpoint.")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--model", type=str, default="multilingual")
    p.add_argument("--ckpt_file", type=str, default="")
    p.add_argument("--vocab_file", type=str, default="")
    p.add_argument("--frontend", type=str, default="phone",
                   choices=["phone", "char", "none"])
    p.add_argument("--nfe_step", type=int, default=32)
    p.add_argument("--cfg_strength", type=float, default=3.0)
    p.add_argument("--sway_sampling_coef", type=float, default=1.0)
    p.add_argument("--cfg_cutoff", type=float, default=-1.0,
                   help="CFG truncation threshold; <0 uses the measured "
                        "serving default (0.5 — docs/performance.md), 0 "
                        "disables (exact full-CFG reference semantics).")
    p.add_argument("--block_cache", type=str, default="default",
                   help="Block-range residual cache spec 'lo-hi:every'; "
                        "'default' uses the measured serving default "
                        "(config.SERVING_BLOCK_CACHE — docs/performance.md), "
                        "'0' disables (exact per-step semantics).")
    p.add_argument("--quant", type=str, default="default",
                   help="DiT weight/activation quantization: 'default' = "
                        "config.SERVING_QUANT (int8 — measured +19-35%% "
                        "RTF at 7.4e-6 mel MSE vs bf16, "
                        "docs/performance.md), 'int8' explicit, 'none' = "
                        "exact float semantics.")
    p.add_argument("--max_batch", type=int, default=4)
    p.add_argument("--max_streams", type=int, default=2,
                   help="Concurrent /tts_stream requests (excess → 503).")
    p.add_argument("--no_warmup", action="store_true")
    p.add_argument("--warmup_batches", default="",
                   help="Comma list of batch sizes (or 'auto' = every batch "
                        "bucket up to --max_batch) to warm THROUGH THE "
                        "DISPATCH PATH at startup, per --warmup_durations "
                        "bucket. Unlike the default synthetic-array warmup, "
                        "this also pre-pays the per-shape first-dispatch "
                        "re-trace (jit caches key on argument commitment), "
                        "which otherwise shows up as a seconds-scale "
                        "latency tail on first real traffic per shape "
                        "(infer/pipeline.py:dispatch_warmup).")
    p.add_argument("--warmup_durations", default="1024",
                   help="Comma list of duration buckets for "
                        "--warmup_batches.")
    p.add_argument("--trace_requests", action="store_true",
                   help="Emit one structured request_trace/stream_trace "
                        "JSON record per request (queue wait, bucket, batch "
                        "size, device ms, TTFB — utils/profiling.py schema) "
                        "so latency regressions are attributable. Also "
                        "enabled by LEMAS_REQUEST_TRACE=1.")
    p.add_argument("--multihost", action="store_true",
                   help="Multi-process serving: every process of a "
                        "configured jax.distributed job runs this entry "
                        "point; process 0 serves HTTP and broadcasts each "
                        "batch, the rest join the SPMD dispatches "
                        "(serve/multihost.py). Batches shard over the "
                        "global 'data' mesh axis; /tts_stream broadcasts "
                        "per mini-batch.")
    return p


def sampler_config_from_args(args):
    """Server-default SamplerConfig from the CLI flags. ``--cfg_cutoff`` < 0
    (the flag default) resolves to the measured serving default
    ``config.SERVING_CFG_CUTOFF``; 0 disables truncation entirely (exact
    full-CFG reference semantics)."""
    from lemas_tts_tpu.cfm.sampler import parse_block_cache
    from lemas_tts_tpu.config import (SERVING_BLOCK_CACHE, SERVING_CFG_CUTOFF,
                                      SamplerConfig)

    cutoff = getattr(args, "cfg_cutoff", -1.0)
    bc = getattr(args, "block_cache", "default")
    if bc == "default":
        bc = SERVING_BLOCK_CACHE
    bc = bc if parse_block_cache(bc) is not None else None  # validate / off
    return SamplerConfig(
        nfe_steps=args.nfe_step, cfg_strength=args.cfg_strength,
        sway_sampling_coef=args.sway_sampling_coef,
        cfg_cutoff=SERVING_CFG_CUTOFF if cutoff < 0 else (cutoff or None),
        block_cache=bc,
    )


def serve(args, *, ready_event: Optional[threading.Event] = None,
          server_box: Optional[list] = None) -> None:
    """Build model + engine, then serve forever. ``ready_event``/``server_box``
    let tests start/stop the server from another thread."""
    import lemas_tts_tpu
    from lemas_tts_tpu.serve.engine import ServingEngine

    # multi-process serving (serve/multihost.py): all processes build the
    # same model over the global mesh; process 0 serves HTTP, the rest join
    # each broadcast SPMD dispatch in follower_serve
    mesh = dispatch = None
    if getattr(args, "multihost", False):
        import jax

        from lemas_tts_tpu.parallel.distributed import (
            initialize,
            make_global_mesh,
        )

        if not initialize():
            raise SystemExit(
                "--multihost needs a configured multi-process JAX job "
                "(set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / "
                "JAX_PROCESS_ID, or run on a TPU pod)")
        mesh = make_global_mesh(model_parallel=1)

    from lemas_tts_tpu.config import resolve_quant

    qv = getattr(args, "quant", "default")
    quant = resolve_quant(qv)
    tts_kwargs = dict(
        model=args.model, ckpt_file=args.ckpt_file,
        vocab_file=args.vocab_file,
        frontend=None if args.frontend == "none" else args.frontend,
        mesh=mesh,
    )
    try:
        tts = lemas_tts_tpu.TTS(quantization=quant, **tts_kwargs)
    except ValueError as e:
        # ONLY the serving-default-on-non-DiT case falls back to float; any
        # other ValueError (bad ckpt/config) must stay loud — a broad catch
        # here once mis-diagnosed unrelated build errors AND paid a second
        # full model build before failing anyway
        if (quant is None or qv != "default"
                or "quantization is only supported" not in str(e)):
            raise
        print("[serve_http] backbone does not support quantization — "
              "serving float")
        tts = lemas_tts_tpu.TTS(**tts_kwargs)
    cfg = sampler_config_from_args(args)
    if getattr(tts, "student", None):
        # distilled-student checkpoint: the server default pins the baked
        # sampler settings (steps=K, cfg 0). Per-request NFE/CFG overrides
        # still work but sample the student off its training grid — the
        # engine serves them, quality is the client's responsibility.
        cfg = tts.apply_student_settings(cfg, show_info=print)

    engine_synth = tts.synth
    if mesh is not None:
        import jax

        from lemas_tts_tpu.serve.multihost import (
            BroadcastSynthesizer,
            MultiHostDispatch,
            follower_serve,
        )

        dispatch = MultiHostDispatch(tts.synth)
        if jax.process_index() != 0:
            print(f"[serve_http] follower process "
                  f"{jax.process_index()}/{jax.process_count()} joining "
                  f"dispatches")
            follower_serve(dispatch)
            return
        engine_synth = BroadcastSynthesizer(dispatch)

    if not args.no_warmup:
        engine_synth.warmup(cfg)
    # dispatch-path warm is independent of --no_warmup: an operator may
    # want ONLY this warm (it subsumes the synthetic one for its buckets)
    if getattr(args, "warmup_batches", ""):
        from lemas_tts_tpu.cfm.sampler import DURATION_BUCKETS
        from lemas_tts_tpu.infer.pipeline import (BATCH_BUCKETS,
                                                  dispatch_warmup,
                                                  pick_bucket)

        if args.warmup_batches.strip().lower() == "auto":
            # up to the bucket real max_batch-sized batches PAD INTO (a
            # non-bucket max_batch like 6 pads to 8 — `<= max_batch` missed
            # exactly the shape first full batches hit)
            top = pick_bucket(args.max_batch, BATCH_BUCKETS)
            bb = tuple(b for b in BATCH_BUCKETS if b <= top)
        else:
            bb = tuple(int(x) for x in args.warmup_batches.split(","))
        dd = tuple(pick_bucket(int(x), DURATION_BUCKETS)
                   for x in args.warmup_durations.split(","))
        n = dispatch_warmup(engine_synth, cfg, duration_buckets=dd,
                            batch_buckets=bb)
        print(f"[serve_http] dispatch-path warmup: {n} dispatches")
    engine = ServingEngine(
        engine_synth, cfg=cfg, max_batch=args.max_batch,
        trace_requests=True if getattr(args, "trace_requests", False)
        else None)
    if dispatch is not None:
        # follower death → heartbeat detection → poison the engine: queued
        # and in-flight futures fail within heartbeat_timeout, new requests
        # get 503, /stats and /healthz keep answering (fleet degradation is
        # terminal; restart the job)
        dispatch.on_degraded.append(engine.poison)
    httpd = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(tts, engine, max_streams=getattr(args, "max_streams", 2),
                     multihost=dispatch),
    )
    if server_box is not None:
        server_box.append((httpd, engine))
    print(f"[serve_http] listening on {args.host}:{httpd.server_address[1]}")
    if ready_event is not None:
        ready_event.set()
    try:
        httpd.serve_forever()
    finally:
        engine.shutdown()
        if dispatch is not None:
            dispatch.shutdown_followers()


def main(argv: Optional[Sequence[str]] = None) -> int:
    serve(build_parser().parse_args(argv))
    return 0


if __name__ == "__main__":
    sys.exit(main())
