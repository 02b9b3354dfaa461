"""ctypes bindings for the native serving micro-batcher
(``native/scheduler.cpp``), with a pure-Python fallback implementation.

Usage (serving engine):

    b = Batcher(max_batch=8, max_wait_ms=20)
    rid = b.submit(bucket=1024, cost=duration_frames)   # from request threads
    ids, bucket = b.next_batch(timeout_ms=100)          # from the device loop
"""

from __future__ import annotations

import ctypes
import threading
import time
from collections import deque
from typing import Dict, List, Optional, Tuple

from lemas_tts_tpu.native import load_library


class _PyBatcher:
    """Fallback: same semantics as scheduler.cpp, in Python."""

    def __init__(self, max_batch: int, max_cost: int, max_wait_us: int):
        self.max_batch = max(1, max_batch)
        self.max_cost = max_cost
        self.max_wait_us = max_wait_us
        self.mu = threading.Condition()
        self.queues: Dict[int, deque] = {}
        self.next_id = 1
        self.closed = False

    def submit(self, bucket: int, cost: int) -> int:
        with self.mu:
            if self.closed:
                return 0
            rid = self.next_id
            self.next_id += 1
            self.queues.setdefault(bucket, deque()).append(
                (rid, max(1, cost), time.monotonic_ns() // 1000)
            )
            self.mu.notify_all()
            return rid

    def _pick(self) -> Optional[int]:
        best, best_ts = None, None
        for b, q in self.queues.items():
            if q and (best_ts is None or q[0][2] < best_ts):
                best, best_ts = b, q[0][2]
        return best

    def next_batch(self, timeout_us: int) -> Tuple[List[int], int]:
        with self.mu:
            deadline = time.monotonic() + timeout_us / 1e6
            while self._pick() is None:
                remain = deadline - time.monotonic()
                if remain <= 0 or self.closed:
                    return [], 0
                self.mu.wait(remain)
            bucket = self._pick()
            if bucket is None:  # raced with another consumer
                return [], 0
            if self.max_wait_us > 0:
                while not self.closed:
                    bq = self.queues.get(bucket)
                    if not bq:  # drained by another consumer → re-pick
                        bucket = self._pick()
                        if bucket is None:
                            return [], 0
                        continue
                    if len(bq) >= self.max_batch:
                        break
                    # deadline tracks the CURRENT pick's head
                    remain = bq[0][2] + self.max_wait_us - time.monotonic_ns() // 1000
                    if remain <= 0:
                        break
                    self.mu.wait(remain / 1e6)
                    repick = self._pick()
                    if repick is not None:
                        bucket = repick
                if bucket is None or not self.queues.get(bucket):
                    return [], 0
            q = self.queues[bucket]
            ids, cost = [], 0
            while q and len(ids) < self.max_batch:
                if self.max_cost > 0 and ids and cost + q[0][1] > self.max_cost:
                    break
                rid, c, _ = q.popleft()
                ids.append(rid)
                cost += c
            return ids, bucket

    def cancel(self, rid: int) -> bool:
        with self.mu:
            for q in self.queues.values():
                for i, (r, _, _) in enumerate(q):
                    if r == rid:
                        del q[i]
                        return True
        return False

    def depth(self) -> int:
        with self.mu:
            return sum(len(q) for q in self.queues.values())

    def close(self):
        with self.mu:
            self.closed = True
            self.mu.notify_all()


class Batcher:
    """Shape-bucketed micro-batching queue (native when available)."""

    def __init__(self, max_batch: int = 8, max_cost: int = 0,
                 max_wait_ms: float = 20.0, force_python: bool = False):
        self._lib = None if force_python else load_library("scheduler")
        wait_us = int(max_wait_ms * 1000)
        # same clamp as the C++ side (scheduler.cpp:57) — the Python-held
        # max_batch sizes the ctypes output arrays, so it must never be < 1
        max_batch = max(1, int(max_batch))
        if self._lib is not None:
            i64 = ctypes.c_int64
            vp = ctypes.c_void_p
            self._lib.batcher_create.restype = vp
            self._lib.batcher_create.argtypes = [i64, i64, i64]
            self._lib.batcher_close.argtypes = [vp]
            self._lib.batcher_submit.restype = ctypes.c_uint64
            self._lib.batcher_submit.argtypes = [vp, i64, i64]
            self._lib.batcher_next_batch.restype = i64
            self._lib.batcher_next_batch.argtypes = [
                vp, ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(i64), i64]
            self._lib.batcher_depth.restype = i64
            self._lib.batcher_depth.argtypes = [vp]
            # batcher_cancel landed in scheduler 1.1; a stale prebuilt .so
            # may lack the symbol — degrade to dispatch-time-only cancel
            try:
                self._lib.batcher_cancel.restype = i64
                self._lib.batcher_cancel.argtypes = [vp, ctypes.c_uint64]
            except AttributeError:
                pass
            self._h = ctypes.c_void_p(
                self._lib.batcher_create(max_batch, max_cost, wait_us)
            )
            self.max_batch = max_batch
        else:
            self._py = _PyBatcher(max_batch, max_cost, wait_us)
            self.max_batch = max_batch

    @property
    def is_native(self) -> bool:
        return self._lib is not None

    def submit(self, bucket: int, cost: int = 1) -> int:
        if self._lib is not None:
            return int(self._lib.batcher_submit(self._h, bucket, cost))
        return self._py.submit(bucket, cost)

    def next_batch(self, timeout_ms: float = 100.0) -> Tuple[List[int], int]:
        """Returns (request_ids, bucket); ([], 0) on timeout/close."""
        if self._lib is not None:
            ids = (ctypes.c_uint64 * self.max_batch)()
            buckets = (ctypes.c_int64 * self.max_batch)()
            n = self._lib.batcher_next_batch(self._h, ids, buckets,
                                             int(timeout_ms * 1000))
            if n <= 0:
                return [], 0
            return [int(ids[i]) for i in range(n)], int(buckets[0])
        return self._py.next_batch(int(timeout_ms * 1000))

    def cancel(self, rid: int) -> bool:
        """Remove a still-queued request (frees queue depth immediately).
        False when unknown/already collected — the engine's dispatch-time
        Future check covers that race."""
        if self._lib is not None:
            if not hasattr(self._lib, "batcher_cancel"):
                return False  # stale prebuilt library (pre-1.1)
            return bool(self._lib.batcher_cancel(self._h, rid))
        return self._py.cancel(rid)

    def depth(self) -> int:
        if self._lib is not None:
            return int(self._lib.batcher_depth(self._h))
        return self._py.depth()

    def close(self):
        if self._lib is not None:
            self._lib.batcher_close(self._h)
        else:
            self._py.close()

    def __del__(self):
        try:
            if getattr(self, "_lib", None) is not None:
                self._lib.batcher_destroy(self._h)
        except Exception:
            pass
