"""Continuous-batching TTS serving engine.

Request threads submit :class:`TTSRequest`; the native micro-batcher
(``native/scheduler.cpp``) coalesces concurrent requests into shape-bucketed
batches; one worker thread drives the device with
``Synthesizer.synthesize_requests`` (every row its own reference mel). The
TTS model/programs are built ONCE and reused — the reference rebuilds the
model per Gradio request (``inference_gradio.py:270-271``).
"""

from __future__ import annotations

import threading
import traceback
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import numpy as np

from lemas_tts_tpu.cfm.sampler import DURATION_BUCKETS, pick_bucket
from lemas_tts_tpu.config import SamplerConfig
from lemas_tts_tpu.native.batcher import Batcher
from lemas_tts_tpu.utils.profiling import TIMERS, JsonLogger


@dataclass
class TTSRequest:
    ref_wav: np.ndarray
    ref_sr: int
    ref_units: Any  # token list or str
    gen_units: Any
    seed: Optional[int] = None
    future: Future = field(default_factory=Future)


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
    ):
        from lemas_tts_tpu.utils.misc import enable_compile_cache

        enable_compile_cache()  # no-op unless LEMAS_COMPILE_CACHE is set
        self.synth = synthesizer
        self.cfg = cfg
        self.max_queue = max_queue
        self.batcher = Batcher(max_batch=max_batch, max_wait_ms=max_wait_ms)
        self.log = logger or JsonLogger()
        self._pending: Dict[int, TTSRequest] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------ client API
    def _estimate_bucket(self, req: TTSRequest) -> int:
        """Duration bucket estimate — groups requests that will compile to the
        same program shape."""
        sr = self.synth.mel_cfg.target_sample_rate
        hop = self.synth.mel_cfg.hop_length
        # shape[-1], not len(): stereo refs are [C, T] and len() would be C
        n_samples = np.asarray(req.ref_wav).shape[-1]
        ref_len = int(n_samples / max(1, req.ref_sr) * sr) // hop
        dur = ref_len + int(
            ref_len / max(1, len(req.ref_units)) * len(req.gen_units) / self.cfg.speed
        )
        return pick_bucket(min(dur, self.cfg.max_duration), DURATION_BUCKETS)

    def submit(self, req: TTSRequest) -> Future:
        """Enqueue a request; the returned Future yields (wave, sr, mel).
        Raises when the engine is shut down or the queue is full
        (backpressure — callers should retry with backoff or shed load)."""
        bucket = self._estimate_bucket(req)
        with self._lock:
            if self.batcher.depth() >= self.max_queue:
                self.log.log("queue_full", depth=self.batcher.depth())
                raise RuntimeError(
                    f"engine queue full ({self.max_queue} pending)"
                )
            rid = self.batcher.submit(bucket=bucket, cost=bucket)
            if rid == 0:
                raise RuntimeError("engine is shut down")
            self._pending[rid] = req
        return req.future

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
            if not reqs:
                continue
            try:
                with TIMERS.stage("serve.batch"):
                    results = self.synth.synthesize_requests(
                        [
                            dict(ref_wav=r.ref_wav, ref_sr=r.ref_sr,
                                 ref_units=r.ref_units, gen_units=r.gen_units,
                                 seed=r.seed)
                            for r in reqs
                        ],
                        cfg=self.cfg,
                    )
                for r, res in zip(reqs, results):
                    # a client may have cancelled its future; don't let that
                    # poison the other rows of the batch
                    if not r.future.done():
                        r.future.set_result(res)
                self.log.log("batch_done", size=len(reqs), bucket=bucket)
            except Exception as e:  # pragma: no cover - defensive
                self.log.log("batch_error", error=str(e),
                             tb=traceback.format_exc(limit=5))
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(e)

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

    def stats(self) -> Dict[str, Any]:
        return {"queue_depth": self.batcher.depth(), "timers": TIMERS.snapshot()}
