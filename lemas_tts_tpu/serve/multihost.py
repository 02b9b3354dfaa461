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
hosts' devices). Streaming broadcasts each mini-batch as its own
(dispatch, finalize) op pair — see ``BroadcastSynthesizer
.synthesize_stream`` — so ``serve_http --multihost`` serves /tts_stream
too, byte-identical to single-process at matching mini-batch grouping.

Demonstrated live by ``tests/serve_mh_worker.py`` (2 real processes, 4
virtual CPU devices each, localhost gRPC) via
``tests/test_parallel.py::test_two_process_serving``.

Fault tolerance (round-5): collectives cannot time out — a crashed or wedged
follower would block process 0's dispatch forever, including the ``/stats``
thread behind the same lock. Liveness therefore rides a plain TCP
side-channel (:class:`_HeartbeatServer` on process 0, one sender thread per
follower): a follower death is detected within ``heartbeat_timeout`` seconds
(a SIGKILL'd peer's FIN/RST usually lands sub-second) and flips the dispatch
into a terminal ``degraded`` state — SPMD lockstep cannot be re-established
after a missed collective, so the fleet must be restarted. Degradation:

- fires every ``on_degraded`` callback (``serve_http`` registers
  ``ServingEngine.poison`` → pending futures fail, new requests get 503);
- makes every subsequent dispatch/warmup fast-fail instead of wedging;
- makes ``aggregated_stats`` answer from the heartbeat table without
  touching the control channel (it also never blocks on a wedged dispatch:
  the lock is acquired with a bounded timeout);
- a watchdog timer around each collective backstops the case where the
  fleet wedges without any heartbeat loss (``op_timeout``).

Symmetrically, a follower whose heartbeat connection to process 0 drops
calls ``on_leader_lost`` (default: log + ``os._exit(3)``) — a follower
blocked in ``recv()`` can never observe the death through the collective
itself. Fault-injection coverage:
``tests/test_parallel.py::test_two_process_serving_follower_death``.
"""

from __future__ import annotations

import contextlib
import os
import pickle
import socket as socket_mod
import struct
import sys
import threading
import time
from typing import Any, Callable, Dict, List, Optional

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
# streaming (round 5 — lifts the /tts_stream 501): one stream = a sequence
# of (dispatch, finalize) op pairs, so the engine's batched dispatches can
# interleave between a stream's mini-batches; the control channel totally
# orders ops, so every process executes the same program sequence. CLOSE is
# sent unconditionally when the stream ends (or is abandoned) — dropped
# pendings hold no un-joined collective: dispatch programs already ran
# fleet-wide, only the finalize allgather is pairwise.
_OP_STREAM_DISPATCH = 5  # pickle((sid, ref_wav, ref_sr, ref_units, chunks,
#                                   bcfg, prep_cfg, seed)) → _dispatch_chunks
_OP_STREAM_FINALIZE = 6  # pickle(sid) → _finalize_chunks (joins allgather)
_OP_STREAM_CLOSE = 7     # pickle(sid) → drop per-stream state


def _mh():
    from jax.experimental import multihost_utils

    return multihost_utils


def _coordinator_host() -> str:
    """Host process 0 advertises for the heartbeat side-channel: the
    coordinator conventionally runs on process 0's machine. Overridable via
    ``LEMAS_MH_HEARTBEAT_HOST`` for split deployments."""
    override = os.environ.get("LEMAS_MH_HEARTBEAT_HOST")
    if override:
        return override
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS", "")
    if ":" in coord:
        return coord.rsplit(":", 1)[0]
    return socket_mod.gethostname()


class _HeartbeatServer:
    """Process-0 side of the liveness side-channel.

    One reader thread per follower connection; ``recv`` with a timeout means
    both abrupt death (FIN/RST) and a wedged-but-connected peer surface
    within ``timeout`` seconds. ``on_dead`` fires once per dead follower."""

    def __init__(self, n_followers: int, timeout: float,
                 on_dead: Callable[[int, str], None],
                 connect_grace: float = 60.0):
        self.timeout = timeout
        self.on_dead = on_dead
        self.connect_grace = connect_grace
        self._t0 = time.monotonic()
        self.last_seen: Dict[int, float] = {}
        self.dead: Dict[int, str] = {}
        self._lock = threading.Lock()
        self._closing = False
        self.sock = socket_mod.socket()
        self.sock.setsockopt(socket_mod.SOL_SOCKET,
                             socket_mod.SO_REUSEADDR, 1)
        self.sock.bind(("0.0.0.0", 0))
        self.sock.listen(max(1, n_followers))
        self.port = self.sock.getsockname()[1]
        self._threads = [threading.Thread(target=self._accept_loop,
                                          daemon=True,
                                          name="mh-heartbeat-accept")]
        self._threads[0].start()
        # grace watchdog: a follower that NEVER connects is also dead
        self._expected = n_followers
        grace = threading.Timer(connect_grace, self._check_connected)
        grace.daemon = True
        grace.start()

    def _check_connected(self) -> None:
        with self._lock:
            missing = self._expected - len(self.last_seen)
            closing = self._closing
        if missing > 0 and not closing:
            self._mark_dead(-1, f"{missing} follower(s) never connected "
                                f"within {self.connect_grace}s")

    def _accept_loop(self) -> None:
        while True:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return  # closed
            t = threading.Thread(target=self._reader, args=(conn,),
                                 daemon=True, name="mh-heartbeat-read")
            t.start()
            self._threads.append(t)

    def _reader(self, conn: socket_mod.socket) -> None:
        pid = None
        try:
            conn.settimeout(self.timeout)
            hdr = b""
            while len(hdr) < 4:
                b = conn.recv(4 - len(hdr))
                if not b:
                    return
                hdr += b
            pid = struct.unpack("<i", hdr)[0]
            with self._lock:
                self.last_seen[pid] = time.monotonic()
            while True:
                b = conn.recv(1)
                if not b:
                    self._mark_dead(pid, "heartbeat connection closed")
                    return
                with self._lock:
                    self.last_seen[pid] = time.monotonic()
        except socket_mod.timeout:
            self._mark_dead(pid, f"no heartbeat for {self.timeout}s")
        except OSError as e:
            self._mark_dead(pid, f"heartbeat connection error: {e}")
        finally:
            with contextlib.suppress(OSError):
                conn.close()

    def _mark_dead(self, pid: Optional[int], reason: str) -> None:
        with self._lock:
            if self._closing:
                return
            key = pid if pid is not None else -1
            if key in self.dead:
                return
            self.dead[key] = reason
        self.on_dead(key, reason)

    def liveness(self) -> Dict[str, Any]:
        now = time.monotonic()
        with self._lock:
            return {
                "followers_expected": self._expected,
                "followers_connected": len(self.last_seen),
                "last_seen_age_s": {str(p): round(now - t, 3)
                                    for p, t in self.last_seen.items()},
                "dead": {str(p): r for p, r in self.dead.items()},
            }

    def quiesce(self) -> None:
        """Stop treating disconnects as deaths (clean fleet shutdown)."""
        with self._lock:
            self._closing = True

    def close(self) -> None:
        self.quiesce()
        with contextlib.suppress(OSError):
            self.sock.close()


def _heartbeat_client(addr: "tuple[str, int]", pid: int, interval: float,
                      on_leader_lost: Callable[[str], None],
                      stop: threading.Event) -> threading.Thread:
    """Follower side: connect to process 0 and send one byte per interval.
    A send/connect failure while ``stop`` is unset means the leader is
    unreachable; after ``stop`` (clean shutdown) failures are expected."""

    def run():
        try:
            conn = socket_mod.create_connection(addr, timeout=30)
            conn.sendall(struct.pack("<i", pid))
            while not stop.is_set():
                conn.sendall(b"\x01")
                stop.wait(interval)
        except OSError as e:
            if not stop.is_set():
                on_leader_lost(f"heartbeat to process 0 failed: {e}")

    t = threading.Thread(target=run, daemon=True, name="mh-heartbeat-send")
    t.start()
    return t


def _default_leader_lost(reason: str) -> None:  # pragma: no cover - fatal
    print(f"[multihost] leader lost ({reason}); follower exiting",
          file=sys.stderr, flush=True)
    os._exit(3)


class MultiHostDispatch:
    """Cross-process control channel + dispatch counters (all processes).

    Process 0 sends ops under :attr:`lock`; followers receive them in
    :func:`follower_serve`. Both sides count joined dispatches so
    :meth:`aggregated_stats` can prove lockstep.

    Liveness/degradation (module docstring): ``op_timeout`` bounds every
    collective op on process 0 (watchdog timer — the wedged thread itself
    cannot be unblocked, but the fleet flips to ``degraded`` and everyone
    else moves on); ``heartbeat_timeout`` bounds follower-death detection.
    ``on_degraded`` callbacks receive one RuntimeError; ``degraded`` is
    terminal — restart the fleet."""

    def __init__(self, synth, *, op_timeout: float = 600.0,
                 heartbeat_interval: float = 0.5,
                 heartbeat_timeout: float = 5.0,
                 stats_lock_timeout: float = 2.0,
                 on_leader_lost: Callable[[str], None] = _default_leader_lost):
        self.synth = synth
        self.lock = threading.Lock()  # orders ALL collective ops on proc 0
        self.dispatches = 0
        self.warmups = 0
        self.op_timeout = op_timeout
        self.stats_lock_timeout = stats_lock_timeout
        self.degraded: Optional[str] = None
        self.on_degraded: List[Callable[[BaseException], None]] = []
        self._degrade_lock = threading.Lock()
        self._hb: Optional[_HeartbeatServer] = None
        self._hb_stop = threading.Event()  # follower: clean-shutdown signal
        # heartbeat side-channel only exists with real followers; the
        # 1-process fleet (self-delivery broadcasts) needs none
        if jax.process_count() > 1:
            if jax.process_index() == 0:
                self._hb = _HeartbeatServer(
                    jax.process_count() - 1, heartbeat_timeout,
                    on_dead=lambda pid, reason: self._mark_degraded(
                        f"follower process {pid}: {reason}"))
                addr = f"{_coordinator_host()}:{self._hb.port}".encode()
                assert len(addr) <= 256, addr
                _mh().broadcast_one_to_all(
                    np.frombuffer(addr.ljust(256), np.uint8))
            else:
                raw = bytes(np.asarray(_mh().broadcast_one_to_all(
                    np.zeros(256, np.uint8))).tobytes()).rstrip()
                host, port = raw.decode().rsplit(":", 1)
                _heartbeat_client((host, int(port)), jax.process_index(),
                                  heartbeat_interval, on_leader_lost,
                                  self._hb_stop)

    # ---------------------------------------------------------- degradation
    def _mark_degraded(self, reason: str) -> None:
        with self._degrade_lock:
            if self.degraded is not None:
                return
            self.degraded = reason
        print(f"[multihost] fleet DEGRADED: {reason} — restart required",
              file=sys.stderr, flush=True)
        exc = RuntimeError(f"multihost fleet degraded: {reason}")
        for cb in list(self.on_degraded):
            try:
                cb(exc)
            except Exception:  # pragma: no cover - callback must not mask
                pass

    @contextlib.contextmanager
    def _bounded_op(self, what: str):
        """Fast-fail when degraded; otherwise arm a watchdog so a collective
        that never completes (follower wedged while its heartbeat still
        flows) still degrades the fleet within ``op_timeout``."""
        if self.degraded is not None:
            raise RuntimeError(f"multihost fleet degraded: {self.degraded}")
        timer = threading.Timer(
            self.op_timeout,
            lambda: self._mark_degraded(
                f"{what} did not complete within op_timeout="
                f"{self.op_timeout}s"))
        timer.daemon = True
        timer.start()
        try:
            yield
        finally:
            timer.cancel()

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
        """Process 0: one stats round-trip across the fleet, plus the
        heartbeat liveness table. Serialized with in-flight dispatches by
        :attr:`lock` — acquired with a bounded timeout so a wedged dispatch
        (or a degraded fleet) can never hang the HTTP /stats thread; in
        that case the answer comes from the heartbeat table alone."""
        base: Dict[str, Any] = {
            "processes": int(jax.process_count()),
            "global_devices": int(jax.device_count()),
            "fleet": self._hb.liveness() if self._hb else None,
            "degraded": self.degraded,
        }
        if self.degraded is not None:
            return {**base, "in_lockstep": False}
        if not self.lock.acquire(timeout=self.stats_lock_timeout):
            # a dispatch holds the channel (possibly wedging toward its
            # op_timeout) — report liveness without joining a collective
            return {**base, "in_lockstep": None, "busy": True}
        try:
            if self.degraded is not None:  # degraded while we waited
                return {**base, "degraded": self.degraded,
                        "in_lockstep": False}
            with self._bounded_op("stats allgather"):
                self.send(_OP_STATS)
                rows = self._stats_gather()
        finally:
            self.lock.release()
        per_proc = [
            {"process": int(r[0]), "dispatches": int(r[1]),
             "warmups": int(r[2]), "local_devices": int(r[3])}
            for r in rows
        ]
        return {
            **base,
            "per_process": per_proc,
            "in_lockstep": len({p["dispatches"] for p in per_proc}) == 1,
        }

    def shutdown_followers(self) -> None:
        """Process 0: release every follower_serve loop. On a degraded
        fleet the broadcast would wedge (lockstep is already lost) — only
        the heartbeat channel is torn down."""
        if self._hb is not None:
            # quiesce FIRST: a follower that processes the shutdown op and
            # exits before we close our socket must not read as a death
            self._hb.quiesce()
        if self.degraded is None and self.lock.acquire(timeout=5.0):
            try:
                if self.degraded is None:
                    self.send(_OP_SHUTDOWN)
            finally:
                self.lock.release()
        if self._hb is not None:
            self._hb.close()


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
        with self._d.lock, self._d._bounded_op("warmup"):
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
        # the watchdog covers broadcast AND compute: a follower that dies
        # mid-compute wedges the local call's fleet-wide collectives too
        with self._d.lock, self._d._bounded_op("dispatch"):
            self._d.send(_OP_DISPATCH, payload)
            self._d.dispatches += 1
            return self.synth.synthesize_requests(reqs, cfg=cfg)

    def synthesize_stream(self, ref_wav, ref_sr, ref_text_units, gen_chunks,
                          cfg, seed=None, chunk_batch: int = 2,
                          first_chunk_batch: Optional[int] = None,
                          first_chunk_cfg=None):
        """Multihost streaming: same generator contract as
        ``Synthesizer.synthesize_stream`` (one ``(wave, sr)`` per text
        chunk, double-buffered), with each mini-batch's device entry points
        broadcast as its own op — dispatch (async program launch) and
        finalize (the fetch allgather) — so batched /tts traffic interleaves
        between a stream's mini-batches instead of blocking behind the whole
        stream. Seeds are pinned before broadcasting (same determinism
        contract as ``synthesize_requests``: the host-RNG noise draw must
        match on every process), and the shared ``_stream_plan`` guarantees
        identical mini-batch grouping."""
        synth = self.synth
        gen_chunks = list(gen_chunks)
        if not gen_chunks:
            return
        if seed is None:
            seed = int(self._entropy.integers(2**31 - 1))
        d = self._d
        with d.lock:
            d._stream_seq = getattr(d, "_stream_seq", 0) + 1
            sid = d._stream_seq
        plan = synth._stream_plan(len(gen_chunks), cfg, chunk_batch,
                                  first_chunk_batch, first_chunk_cfg)
        # host-local prep (deterministic from the broadcast inputs; each
        # follower computes its own copy once per stream)
        ref_prep = synth._prepare_ref(ref_wav, ref_sr, cfg)

        def _finalize(p):
            with d.lock, d._bounded_op("stream finalize"):
                d.send(_OP_STREAM_FINALIZE, pickle.dumps(sid))
                return synth._finalize_chunks(p[0], p[1], return_parts=True)

        pending = None
        try:
            for start, size, bcfg in plan:
                batch = list(gen_chunks[start:start + size])
                payload = pickle.dumps((sid, ref_wav, ref_sr, ref_text_units,
                                        batch, bcfg, cfg, seed))
                with d.lock, d._bounded_op("stream dispatch"):
                    d.send(_OP_STREAM_DISPATCH, payload)
                    d.dispatches += 1
                    nxt = (synth._dispatch_chunks(
                        ref_wav, ref_sr, ref_text_units, batch, cfg=bcfg,
                        seed=seed, ref_prep=ref_prep), bcfg)
                if pending is not None:
                    waves, sr, _ = _finalize(pending)
                    pending = None
                    for w in waves:
                        yield w, sr
                pending = nxt
            waves, sr, _ = _finalize(pending)
            pending = None
            for w in waves:
                yield w, sr
        finally:
            # unconditional close releases follower-side stream state, also
            # on abandonment (client disconnect → generator .close()); on a
            # degraded fleet the broadcast is skipped (suppress catches the
            # _bounded_op fast-fail)
            with contextlib.suppress(Exception):
                with d.lock, d._bounded_op("stream close"):
                    d.send(_OP_STREAM_CLOSE, pickle.dumps(sid))


def follower_serve(dispatch: MultiHostDispatch) -> Dict[str, int]:
    """Run on every process with ``jax.process_index() != 0``: join each
    broadcast dispatch/warmup/stats/stream collective until shutdown.
    Returns the final counters (for test verdicts/logging)."""
    from collections import deque

    synth = dispatch.synth
    # per-stream state: sid → {"prep": ref prep (once), "pending": deque of
    # (pending dict, cfg) awaiting their finalize op}
    streams: Dict[int, Dict[str, Any]] = {}
    while True:
        op, payload = dispatch.recv()
        if op == _OP_SHUTDOWN:
            # clean shutdown: stop the heartbeat sender so the dropping
            # connection isn't misread as a dead leader
            dispatch._hb_stop.set()
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
        elif op == _OP_STREAM_DISPATCH:
            (sid, ref_wav, ref_sr, ref_units, chunks, bcfg, prep_cfg,
             seed) = pickle.loads(payload)
            st = streams.setdefault(sid, {"prep": None, "pending": deque()})
            if st["prep"] is None:
                st["prep"] = synth._prepare_ref(ref_wav, ref_sr, prep_cfg)
            dispatch.dispatches += 1
            st["pending"].append((synth._dispatch_chunks(
                ref_wav, ref_sr, ref_units, chunks, cfg=bcfg, seed=seed,
                ref_prep=st["prep"]), bcfg))
        elif op == _OP_STREAM_FINALIZE:
            sid = pickle.loads(payload)
            p, bcfg = streams[sid]["pending"].popleft()
            # joins the fetch allgather; the replicated waves are dropped
            synth._finalize_chunks(p, bcfg, return_parts=True)
        elif op == _OP_STREAM_CLOSE:
            streams.pop(pickle.loads(payload), None)
        else:  # unknown op: a protocol bug must fail loudly, not desync
            raise RuntimeError(f"unknown multihost serving op {op}")
