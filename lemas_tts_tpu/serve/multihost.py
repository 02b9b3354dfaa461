"""Multi-process (multi-host) serving: requests enter on process 0, every
sampler dispatch shards over the GLOBAL mesh.

The reference has no serving runtime at all (SURVEY.md §2.3/§3.4 — one
request at a time, one process per GPU for the denoise tool); the TPU-native
multi-host story is SPMD: a jitted program over a mesh that spans processes
must be entered by EVERY process, in the same order, with the same shapes —
GSPMD then runs its collectives over ICI/DCN. Serving is asymmetric
(requests arrive at one frontend), so this module bridges the two worlds:

- process 0 runs the :class:`~lemas_tts_tpu.serve.engine.ServingEngine`
  (and the HTTP frontend, ``scripts/serve_http.py --multihost``) over a
  :class:`BroadcastSynthesizer` proxy that broadcasts each batch payload to
  the other processes *before* running it;
- every other process runs :func:`follower_serve`, a loop that receives
  payloads and joins the same ``Synthesizer.synthesize_requests`` call, so
  the per-process program executions stay in lockstep.

The control channel is a length-prefixed pickle over
``multihost_utils.broadcast_one_to_all`` — it rides the same runtime
transport as the compute collectives, so no extra sockets, auth, or
serialization format is introduced. All cross-process operations on process
0 are serialized by one lock (engine worker thread, stats, shutdown), which
is what guarantees the global ordering SPMD requires.

Determinism contract: follower processes must end up with bit-identical
batch inputs, so the proxy fills in any missing per-request seeds on
process 0 before broadcasting (unseeded rows would otherwise draw
process-local entropy and silently shard different noise onto different
hosts' devices). Streaming (`synthesize_stream`) is host-RNG-driven and
stays single-process — ``serve_http --multihost`` answers 501 for it.

Demonstrated live by ``tests/serve_mh_worker.py`` (2 real processes, 4
virtual CPU devices each, localhost gRPC) via
``tests/test_parallel.py::test_two_process_serving``.
"""

from __future__ import annotations

import pickle
import threading
from typing import Any, Dict, List, Optional

import numpy as np

import jax

__all__ = [
    "MultiHostDispatch",
    "BroadcastSynthesizer",
    "follower_serve",
]

# control-channel opcodes (int32 header: [op, payload_len])
_OP_DISPATCH = 1  # payload = pickle((requests, cfg)) → synthesize_requests
_OP_WARMUP = 2    # payload = pickle((cfg, kwargs))   → Synthesizer.warmup
_OP_STATS = 3     # no payload; all processes join a stats allgather
_OP_SHUTDOWN = 4  # no payload; followers return from follower_serve


def _mh():
    from jax.experimental import multihost_utils

    return multihost_utils


class MultiHostDispatch:
    """Cross-process control channel + dispatch counters (all processes).

    Process 0 sends ops under :attr:`lock`; followers receive them in
    :func:`follower_serve`. Both sides count joined dispatches so
    :meth:`aggregated_stats` can prove lockstep."""

    def __init__(self, synth):
        self.synth = synth
        self.lock = threading.Lock()  # orders ALL collective ops on proc 0
        self.dispatches = 0
        self.warmups = 0

    # --------------------------------------------------------- byte channel
    def send(self, op: int, payload: bytes = b"") -> None:
        """Process-0 side: broadcast one (op, payload). Caller holds lock."""
        mh = _mh()
        mh.broadcast_one_to_all(np.asarray([op, len(payload)], np.int32))
        if payload:
            mh.broadcast_one_to_all(np.frombuffer(payload, np.uint8))

    def recv(self) -> "tuple[int, bytes]":
        """Follower side: block for the next (op, payload)."""
        mh = _mh()
        header = np.asarray(
            mh.broadcast_one_to_all(np.zeros(2, np.int32)))
        op, n = int(header[0]), int(header[1])
        payload = b""
        if n:
            payload = bytes(
                np.asarray(mh.broadcast_one_to_all(np.zeros(n, np.uint8)))
                .tobytes())
        return op, payload

    # ------------------------------------------------------------ stats op
    def _stats_gather(self) -> np.ndarray:
        """The collective body of the stats op — every process contributes
        [process_index, dispatches, warmups, local_device_count]."""
        row = np.asarray([jax.process_index(), self.dispatches, self.warmups,
                          jax.local_device_count()], np.int64)
        return np.asarray(_mh().process_allgather(row))

    def aggregated_stats(self) -> Dict[str, Any]:
        """Process 0: one stats round-trip across the fleet. Serialized with
        in-flight dispatches by :attr:`lock`, so it can be called from the
        HTTP /stats thread while batches flow."""
        with self.lock:
            self.send(_OP_STATS)
            rows = self._stats_gather()
        per_proc = [
            {"process": int(r[0]), "dispatches": int(r[1]),
             "warmups": int(r[2]), "local_devices": int(r[3])}
            for r in rows
        ]
        return {
            "processes": int(jax.process_count()),
            "global_devices": int(jax.device_count()),
            "per_process": per_proc,
            "in_lockstep": len({p["dispatches"] for p in per_proc}) == 1,
        }

    def shutdown_followers(self) -> None:
        """Process 0: release every follower_serve loop."""
        with self.lock:
            self.send(_OP_SHUTDOWN)


class BroadcastSynthesizer:
    """Engine-facing Synthesizer proxy for process 0.

    Same duck-typed surface the :class:`ServingEngine` consumes
    (``estimate_bucket`` / ``synthesize_requests``) plus ``warmup`` for the
    serving startup hook; every device-dispatching call first broadcasts its
    payload so followers join the same SPMD program. Host-only estimation is
    served locally."""

    def __init__(self, dispatch: MultiHostDispatch):
        self._d = dispatch
        self.synth = dispatch.synth
        self._entropy = np.random.default_rng()

    # host-only: no collective, no broadcast
    def estimate_bucket(self, *args, **kwargs) -> int:
        return self.synth.estimate_bucket(*args, **kwargs)

    def warmup(self, cfg, **kwargs) -> int:
        payload = pickle.dumps((cfg, kwargs))
        with self._d.lock:
            self._d.send(_OP_WARMUP, payload)
            self._d.warmups += 1
            return self.synth.warmup(cfg, **kwargs)

    def synthesize_requests(self, requests, cfg) -> List:
        # pin seeds BEFORE broadcasting: unseeded rows draw host entropy
        # inside synthesize_requests, and each process's devices hold that
        # process's copy of its batch shards — differing seeds would shard
        # inconsistent noise across the fleet without any error.
        reqs = []
        for r in requests:
            r = dict(r)
            if r.get("seed") is None:
                r["seed"] = int(self._entropy.integers(2**31 - 1))
            reqs.append(r)
        payload = pickle.dumps((reqs, cfg))
        with self._d.lock:
            self._d.send(_OP_DISPATCH, payload)
            self._d.dispatches += 1
            return self.synth.synthesize_requests(reqs, cfg=cfg)


def follower_serve(dispatch: MultiHostDispatch) -> Dict[str, int]:
    """Run on every process with ``jax.process_index() != 0``: join each
    broadcast dispatch/warmup/stats collective until shutdown. Returns the
    final counters (for test verdicts/logging)."""
    synth = dispatch.synth
    while True:
        op, payload = dispatch.recv()
        if op == _OP_SHUTDOWN:
            return {"dispatches": dispatch.dispatches,
                    "warmups": dispatch.warmups}
        if op == _OP_DISPATCH:
            reqs, cfg = pickle.loads(payload)
            dispatch.dispatches += 1
            # identical inputs → identical program → lockstep collectives;
            # the results are fully replicated, this process just drops them
            synth.synthesize_requests(reqs, cfg=cfg)
        elif op == _OP_WARMUP:
            cfg, kwargs = pickle.loads(payload)
            dispatch.warmups += 1
            synth.warmup(cfg, **kwargs)
        elif op == _OP_STATS:
            dispatch._stats_gather()
        else:  # unknown op: a protocol bug must fail loudly, not desync
            raise RuntimeError(f"unknown multihost serving op {op}")
