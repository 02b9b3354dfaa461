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
