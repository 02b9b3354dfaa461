"""Tracing / profiling / structured logging — first-class observability.

The reference has only ad-hoc prints and tqdm (SURVEY.md §5 "Tracing: none").
Here: per-stage wall-clock timers with aggregate stats, optional
``jax.profiler`` trace capture for TPU timelines, and a structured JSON-lines
logger for serving metrics.
"""

from __future__ import annotations

import contextlib
import json
import sys
import threading
import time
from collections import defaultdict
from typing import Any, Dict, Iterator, Optional


class StageTimers:
    """Named wall-clock timers with count/total/max aggregation."""

    def __init__(self):
        self._lock = threading.Lock()
        self._stats: Dict[str, Dict[str, float]] = defaultdict(
            lambda: {"count": 0, "total_s": 0.0, "max_s": 0.0}
        )

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                s = self._stats[name]
                s["count"] += 1
                s["total_s"] += dt
                s["max_s"] = max(s["max_s"], dt)

    def snapshot(self) -> Dict[str, Dict[str, float]]:
        with self._lock:
            return {
                k: {**v, "mean_s": v["total_s"] / max(1, v["count"])}
                for k, v in self._stats.items()
            }

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.snapshot().items()):
            lines.append(
                f"{name:<28} n={int(s['count']):>5}  "
                f"mean={s['mean_s'] * 1000:8.2f}ms  max={s['max_s'] * 1000:8.2f}ms"
            )
        return "\n".join(lines)


TIMERS = StageTimers()  # process-global default


# Per-request trace record schema (round 5 — serving observability): when
# tracing is on (``ServingEngine(trace_requests=True)`` /
# ``serve_http --trace_requests`` / env ``LEMAS_REQUEST_TRACE=1``), the
# engine emits one ``request_trace`` JSON-lines event per completed request
# and the HTTP layer one ``stream_trace`` per stream, so a latency
# regression is attributable to its stage (queue wait vs device time vs
# batching) and its shape bucket. Field contract, pinned by
# ``tests/test_serve_http.py``:
REQUEST_TRACE_FIELDS = {
    "rid": "engine request id",
    "bucket": "composite batch key (cfg_id * stride + duration bucket)",
    "dur_bucket": "duration bucket (frames)",
    "batch_size": "rows in the dispatched batch this request rode in",
    "queue_wait_ms": "submit → batch collection",
    "device_ms": "batch device wall (shared by all rows of the batch)",
    "total_ms": "submit → result set",
    "outcome": "ok | error | shed_timeout | shed_cancelled",
}
STREAM_TRACE_FIELDS = {
    "ttfb_ms": "request start → first audio chunk written",
    "n_chunks": "text chunks synthesized",
    "total_ms": "request start → stream complete",
    "chunk_batch": "steady-state mini-batch size",
    "outcome": "ok | aborted",
}


def trace_record(logger: "JsonLogger", event: str, **fields: Any) -> None:
    """Emit a schema-checked trace record (unknown fields fail loudly in
    tests rather than silently forking the schema)."""
    schema = (REQUEST_TRACE_FIELDS if event == "request_trace"
              else STREAM_TRACE_FIELDS)
    unknown = set(fields) - set(schema)
    assert not unknown, f"unknown trace fields {unknown} for {event}"
    logger.log(event, **fields)


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a ``jax.profiler`` trace (TensorBoard/XProf timeline) around a
    code region — the TPU-native replacement for nvprof-style profiling."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class JsonLogger:
    """Structured JSON-lines event logger (metrics, serving events)."""

    def __init__(self, stream=None, path: Optional[str] = None):
        self._lock = threading.Lock()
        self._fh = open(path, "a", encoding="utf-8") if path else (stream or sys.stderr)

    def log(self, event: str, **fields: Any) -> None:
        rec = {"ts": time.time(), "event": event, **fields}
        line = json.dumps(rec, default=str)
        with self._lock:
            self._fh.write(line + "\n")
            self._fh.flush()
