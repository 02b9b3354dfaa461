"""Continuous-batching TTS serving engine.

Request threads submit :class:`TTSRequest`; the native micro-batcher
(``native/scheduler.cpp``) coalesces concurrent requests into shape-bucketed
batches; one worker thread drives the device with
``Synthesizer.synthesize_requests`` (every row its own reference mel). The
TTS model/programs are built ONCE and reused — the reference rebuilds the
model per Gradio request (``inference_gradio.py:270-271``).
"""

from __future__ import annotations

import os
import threading
import time
import traceback
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import numpy as np

from lemas_tts_tpu.config import SamplerConfig
from lemas_tts_tpu.native.batcher import Batcher
from lemas_tts_tpu.utils.profiling import TIMERS, JsonLogger

# composite-bucket stride: bucket = cfg_id * _BUCKET_STRIDE + duration_bucket.
# Must exceed DURATION_BUCKETS[-1] (4096) so the two factors never collide.
_BUCKET_STRIDE = 1 << 13
# cap on distinct per-request sampler settings an engine will ever serve
# (each pins compiled programs for its lifetime)
_MAX_CFG_IDS = 32


@dataclass
class TTSRequest:
    ref_wav: np.ndarray
    ref_sr: int
    ref_units: Any  # token list or str
    gen_units: Any
    seed: Optional[int] = None
    # per-request sampler settings (None → engine default). Requests are
    # batched only with same-settings peers: the program shape is keyed on
    # SamplerSettings, so mixing would force one row's settings on the batch.
    cfg: Optional[SamplerConfig] = None
    # engine-side deadline (seconds from submit; None = no limit): a request
    # still QUEUED past its timeout is shed at dispatch time with
    # TimeoutError on its future instead of wasting a batch slot — under
    # overload the device only ever runs work someone is still waiting for.
    timeout: Optional[float] = None
    future: Future = field(default_factory=Future)
    _t_submit: float = field(default=0.0, repr=False)
    _rid: int = field(default=0, repr=False)
    _bucket: int = field(default=0, repr=False)
    _dur_bucket: int = field(default=0, repr=False)


class ServingEngine:
    """Long-lived engine: submit() from any thread, results via Future."""

    def __init__(
        self,
        synthesizer,
        cfg: SamplerConfig = SamplerConfig(),
        # measured on v5e at N=1024, NFE=32 (post layout-fix/istft-fold
        # curve, CLAUDE.md perf log): B=4 → 33.8, B=8 → 35.0, B=16/32 →
        # 35.9 audio-s/s per chip — 8 balances throughput vs queueing
        # latency; raise for offline batch jobs.
        max_batch: int = 8,
        max_wait_ms: float = 15.0,
        logger: Optional[JsonLogger] = None,
        max_queue: int = 256,
        trace_requests: Optional[bool] = None,
    ):
        from lemas_tts_tpu.utils.misc import enable_compile_cache

        enable_compile_cache()  # no-op unless LEMAS_COMPILE_CACHE is set
        self.synth = synthesizer
        self.cfg = cfg
        self.max_queue = max_queue
        self.batcher = Batcher(max_batch=max_batch, max_wait_ms=max_wait_ms)
        self.log = logger or JsonLogger()
        # per-request trace records (utils/profiling.py REQUEST_TRACE_FIELDS)
        # — attributable latency behind a flag; env enables it fleet-wide
        self.trace_requests = (os.environ.get("LEMAS_REQUEST_TRACE") == "1"
                               if trace_requests is None else trace_requests)
        self._pending: Dict[int, TTSRequest] = {}
        self._lock = threading.Lock()
        # load-shedding counters (dispatch-time): requests that never reached
        # the device because their client cancelled or their deadline passed
        self._shed = {"cancelled": 0, "timed_out": 0}
        # per-settings ids for composite bucketing; id 0 = the default cfg
        self._cfg_ids: Dict[SamplerConfig, int] = {cfg: 0}
        self._latencies: Dict[str, deque] = {}
        # backend degradation (multihost fleet loss): terminal — submit()
        # rejects, pending/in-flight futures fail fast
        self._poisoned: Optional[BaseException] = None
        self._inflight: list = []
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------ client API
    def register_cfg(self, cfg: SamplerConfig) -> int:
        """Settings-id for composite bucketing, enforcing the per-lifetime cap
        on distinct sampler settings: each combination pins jitted programs
        for life (one per shape bucket, ~10 s compile each on TPU), so a
        client sweeping settings must not mint compiles without bound.
        EVERY per-request-settings path must pass through here — including
        ones that bypass the batcher (``serve_http`` streams) — or it
        reopens the compile-DoS this cap closes. RuntimeError → 503 at the
        HTTP layer."""
        with self._lock:
            cfg_id = self._cfg_ids.get(cfg)
            if cfg_id is None:
                if len(self._cfg_ids) >= _MAX_CFG_IDS:
                    raise RuntimeError(
                        f"too many distinct sampler settings "
                        f"({_MAX_CFG_IDS}); reuse an existing combination"
                    )
                cfg_id = len(self._cfg_ids)
                self._cfg_ids[cfg] = cfg_id
        return cfg_id

    def _estimate_bucket(self, req: TTSRequest) -> "tuple[int, int]":
        """Composite batch key: (sampler-settings id, duration bucket) packed
        into one int for the native batcher, plus the raw duration bucket
        (the batcher's cost unit). The duration estimate is the synthesizer's
        own (``Synthesizer.estimate_bucket`` — single source of truth with
        the synthesis paths), so the grouped requests really do compile to
        one program shape."""
        cfg = req.cfg or self.cfg
        dur_bucket = self.synth.estimate_bucket(
            req.ref_wav, req.ref_sr, req.ref_units, req.gen_units, cfg
        )
        cfg_id = self.register_cfg(cfg)
        return cfg_id * _BUCKET_STRIDE + dur_bucket, dur_bucket

    def submit(self, req: TTSRequest) -> Future:
        """Enqueue a request; the returned Future yields (wave, sr, mel).
        Raises when the engine is shut down or the queue is full
        (backpressure — callers should retry with backoff or shed load)."""
        if self._poisoned is not None:
            raise RuntimeError(f"engine degraded: {self._poisoned}")
        bucket, dur_bucket = self._estimate_bucket(req)
        req._t_submit = time.perf_counter()
        with self._lock:
            if self._poisoned is not None:
                raise RuntimeError(f"engine degraded: {self._poisoned}")
            if self.batcher.depth() >= self.max_queue:
                self.log.log("queue_full", depth=self.batcher.depth())
                raise RuntimeError(
                    f"engine queue full ({self.max_queue} pending)"
                )
            # cost = duration frames (the batcher's max_cost budget is in
            # frames); the composite key must NOT leak into the cost or one
            # non-default-settings request would blow any frame budget
            rid = self.batcher.submit(bucket=bucket, cost=dur_bucket)
            if rid == 0:
                raise RuntimeError("engine is shut down")
            req._rid = rid
            req._bucket, req._dur_bucket = bucket, dur_bucket
            self._pending[rid] = req
        return req.future

    def cancel(self, fut: Future) -> bool:
        """Cancel a submitted request (client disconnect). Returns True if
        the request will never produce a result. Still-queued requests are
        removed from the batcher immediately (freeing queue depth for
        backpressure) and their futures cancelled. A request the worker has
        already collected but not yet marked running (a microsecond window)
        is cancelled the same way and shed at dispatch. Once its future is
        RUNNING — the batch is on the device — ``Future.cancel()`` fails by
        contract: this returns False and the result IS delivered into the
        (abandoned) future; that row's compute is spent, which is the
        unavoidable race window."""
        with self._lock:
            # pending set is bounded by max_queue — a scan is fine
            req = next((r for r in self._pending.values()
                        if r.future is fut), None)
            if req is None:
                return fut.cancel() or fut.cancelled()
            if self.batcher.cancel(req._rid):
                self._pending.pop(req._rid, None)
                self._shed["cancelled"] += 1
        cancelled = fut.cancel()
        if cancelled:
            self.log.log("request_cancelled", rid=req._rid)
        return cancelled

    def synthesize(self, ref_wav, ref_sr, ref_units, gen_units,
                   seed=None, timeout: Optional[float] = None):
        """Blocking convenience wrapper."""
        fut = self.submit(TTSRequest(ref_wav, ref_sr, ref_units, gen_units, seed))
        return fut.result(timeout=timeout)

    # ------------------------------------------------------------ device loop
    def _loop(self):
        while not self._stop.is_set():
            ids, bucket = self.batcher.next_batch(timeout_ms=100)
            if not ids:
                continue
            with self._lock:
                reqs = [self._pending.pop(i) for i in ids if i in self._pending]
            # dispatch-time load shedding: under overload the device must
            # only run work someone is still waiting for. Cancelled futures
            # and requests past their deadline are dropped BEFORE the batch
            # is padded/compiled/dispatched, not after.
            now = time.perf_counter()
            t_collect = now
            live = []
            for r in reqs:
                if r.future.cancelled() or not r.future.set_running_or_notify_cancel():
                    with self._lock:
                        self._shed["cancelled"] += 1
                    self._trace(r, t_collect, 0.0, 0, "shed_cancelled")
                    continue
                if (r.timeout is not None and r._t_submit
                        and now - r._t_submit > r.timeout):
                    r.future.set_exception(TimeoutError(
                        f"request shed after {now - r._t_submit:.2f}s in queue"
                        f" (timeout={r.timeout}s)"))
                    with self._lock:
                        self._shed["timed_out"] += 1
                    self.log.log("request_timed_out", rid=r._rid,
                                 queued_s=round(now - r._t_submit, 3))
                    self._trace(r, t_collect, 0.0, 0, "shed_timeout")
                    continue
                live.append(r)
            reqs = live
            if not reqs:
                continue
            # composite bucket ⇒ every request in the batch shares settings
            cfg = reqs[0].cfg or self.cfg
            with self._lock:
                # visible to poison(): if the backend wedges inside this
                # call (multihost follower death), these futures must be
                # failable from outside the stuck worker thread
                self._inflight = reqs
            try:
                t_dev = time.perf_counter()
                with TIMERS.stage("serve.batch"):
                    results = self.synth.synthesize_requests(
                        [
                            dict(ref_wav=r.ref_wav, ref_sr=r.ref_sr,
                                 ref_units=r.ref_units, gen_units=r.gen_units,
                                 seed=r.seed)
                            for r in reqs
                        ],
                        cfg=cfg,
                    )
                now = time.perf_counter()
                device_s = now - t_dev
                for r, res in zip(reqs, results):
                    # observability BEFORE resolution: a reader that sees a
                    # completed future must find its request_trace already
                    # written (the reverse order raced the client thread
                    # against the trace emission)
                    if r._t_submit:
                        self.record_latency("request", now - r._t_submit)
                    self._trace(r, t_collect, device_s, len(reqs), "ok")
                    # a client may have cancelled its future; don't let that
                    # poison the other rows of the batch
                    if not r.future.done():
                        r.future.set_result(res)
                self.log.log("batch_done", size=len(reqs), bucket=bucket)
            except Exception as e:  # pragma: no cover - defensive
                self.log.log("batch_error", error=str(e),
                             tb=traceback.format_exc(limit=5))
                for r in reqs:
                    self._trace(r, t_collect, 0.0, len(reqs), "error")
                    if not r.future.done():
                        r.future.set_exception(e)
            finally:
                with self._lock:
                    self._inflight = []

    def _trace(self, req: TTSRequest, t_collect: float, device_s: float,
               batch_size: int, outcome: str) -> None:
        """One request_trace record (utils/profiling.py schema) when tracing
        is enabled — queue wait vs device time vs bucket, per request."""
        if not self.trace_requests:
            return
        from lemas_tts_tpu.utils.profiling import trace_record

        now = time.perf_counter()
        trace_record(
            self.log, "request_trace",
            rid=req._rid, bucket=req._bucket, dur_bucket=req._dur_bucket,
            batch_size=batch_size,
            queue_wait_ms=round((t_collect - req._t_submit) * 1e3, 2)
            if req._t_submit else None,
            device_ms=round(device_s * 1e3, 2),
            total_ms=round((now - req._t_submit) * 1e3, 2)
            if req._t_submit else None,
            outcome=outcome,
        )

    def poison(self, exc: BaseException) -> None:
        """Terminal backend degradation (registered as the multihost
        ``on_degraded`` callback): fail every queued and in-flight future
        NOW — without waiting on the worker thread, which may be wedged
        inside a dead fleet's collective — and reject all new submits
        (RuntimeError → 503 at the HTTP layer). The engine object stays
        alive so /healthz and /stats keep answering."""
        with self._lock:
            if self._poisoned is not None:
                return
            self._poisoned = exc
            victims = list(self._pending.values()) + list(self._inflight)
            self._pending.clear()
        self.log.log("engine_poisoned", error=str(exc))
        for r in victims:
            if not r.future.done():
                # in-flight futures are RUNNING (cancel() is impossible by
                # Future contract) but set_exception is allowed; the wedged
                # worker's later set_result is guarded by future.done()
                r.future.set_exception(exc)

    # --------------------------------------------------------------- shutdown
    def shutdown(self):
        self._stop.set()
        self.batcher.close()
        self._worker.join(timeout=5)
        with self._lock:
            for r in self._pending.values():
                if not r.future.done():
                    r.future.set_exception(RuntimeError("engine shut down"))
            self._pending.clear()

    # -------------------------------------------------------------- metrics
    def record_latency(self, kind: str, seconds: float) -> None:
        """Record one latency sample (seconds) under ``kind`` — the engine
        records end-to-end ``request`` latency itself; the HTTP layer adds
        ``stream_ttfb`` (time to first streamed audio chunk)."""
        with self._lock:
            self._latencies.setdefault(kind, deque(maxlen=512)).append(seconds)

    @staticmethod
    def _percentiles(samples) -> Dict[str, float]:
        a = np.sort(np.asarray(samples, np.float64))
        pick = lambda q: float(a[min(len(a) - 1, int(q * (len(a) - 1) + 0.5))])
        return {"count": len(a), "p50_ms": round(pick(0.50) * 1e3, 2),
                "p90_ms": round(pick(0.90) * 1e3, 2),
                "p99_ms": round(pick(0.99) * 1e3, 2),
                "max_ms": round(float(a[-1]) * 1e3, 2)}

    def stats(self) -> Dict[str, Any]:
        with self._lock:
            lat = {k: self._percentiles(v)
                   for k, v in self._latencies.items() if v}
            n_cfgs = len(self._cfg_ids)
            shed = dict(self._shed)
        return {"queue_depth": self.batcher.depth(), "timers": TIMERS.snapshot(),
                "latency": lat, "settings_variants": n_cfgs, "shed": shed,
                "degraded": str(self._poisoned) if self._poisoned else None}
