"""HTTP serving endpoint: health/stats, synthesis round-trip, error paths."""

import base64
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from lemas_tts_tpu.scripts import serve_http

DATA = __import__("pathlib").Path(__file__).parent / "data"


@pytest.fixture(scope="module")
def tiny_tts(tmp_path_factory):
    import warnings

    from lemas_tts_tpu import TTS

    vocab_path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    tokens = [" "] + list("abcdefghijklmnopqrstuvwxyz") + [
        "(en)", "(zh)", "_", ",", ".", "!", "?", "#1", "#2", "#3", "#4",
    ]
    vocab_path.write_text("\n".join(tokens) + "\n")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return TTS(model=str(DATA / "tiny.yaml"), vocab_file=str(vocab_path),
                   device="cpu", frontend="phone")


_ENGINE = {}  # populated by the server fixture for engine-level assertions


@pytest.fixture(scope="module")
def server(tiny_tts):
    args = serve_http.build_parser().parse_args(
        ["--port", "0", "--nfe_step", "2", "--cfg_strength", "1.0",
         "--no_warmup"]
    )
    ready = threading.Event()
    box = []

    # build the engine over the session-tiny TTS instead of the flagship
    import lemas_tts_tpu

    orig = lemas_tts_tpu.TTS
    lemas_tts_tpu.TTS = lambda **kw: tiny_tts
    try:
        t = threading.Thread(
            target=serve_http.serve,
            args=(args,), kwargs={"ready_event": ready, "server_box": box},
            daemon=True,
        )
        t.start()
        assert ready.wait(timeout=300), "server failed to start"
    finally:
        lemas_tts_tpu.TTS = orig
    httpd, engine = box[0]
    _ENGINE["engine"] = engine
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


@pytest.fixture
def server_engine(server):
    return _ENGINE["engine"]


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, r.read()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _ref_b64(sr=8000):
    t = np.arange(sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    pcm = (wav * 32767).astype("<i2")
    import io
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return base64.b64encode(buf.getvalue()).decode()


def test_request_cfg_alias_conflict_rejected():
    """nfe_step/nfe_steps disagreeing must raise (→ 400), not silently
    resolve by dict order; agreeing aliases are fine."""
    from lemas_tts_tpu.config import SamplerConfig

    base = SamplerConfig()
    with pytest.raises(ValueError, match="alias"):
        serve_http._request_cfg(base, {"nfe_step": 4, "nfe_steps": 64})
    cfg = serve_http._request_cfg(base, {"nfe_step": 8, "nfe_steps": 8})
    assert cfg.nfe_steps == 8


def test_engine_register_cfg_caps_distinct_settings(tiny_tts):
    """Every per-request-settings path (incl. /tts_stream, which bypasses
    the batcher) goes through register_cfg — the compile-DoS cap."""
    import dataclasses

    from lemas_tts_tpu.config import SamplerConfig
    from lemas_tts_tpu.serve import engine as eng_mod
    from lemas_tts_tpu.serve.engine import ServingEngine

    base = SamplerConfig(nfe_steps=2, cfg_strength=1.0)
    eng = ServingEngine(tiny_tts.synth, cfg=base, max_batch=1)
    try:
        for i in range(eng_mod._MAX_CFG_IDS - 1):
            eng.register_cfg(dataclasses.replace(
                base, cfg_strength=1.0 + 0.001 * (i + 1)))
        with pytest.raises(RuntimeError, match="distinct sampler settings"):
            eng.register_cfg(dataclasses.replace(base, cfg_strength=9.9))
        # already-registered settings stay accepted at the cap
        assert eng.register_cfg(base) == 0
    finally:
        eng.shutdown()


def test_cfg_cutoff_flag_resolution():
    """--cfg_cutoff default → SERVING_CFG_CUTOFF; 0 → exact full CFG;
    explicit value → itself."""
    from lemas_tts_tpu.config import SERVING_CFG_CUTOFF

    parse = serve_http.build_parser().parse_args
    resolve = serve_http.sampler_config_from_args
    assert resolve(parse([])).cfg_cutoff == SERVING_CFG_CUTOFF
    assert resolve(parse(["--cfg_cutoff", "0"])).cfg_cutoff is None
    assert resolve(parse(["--cfg_cutoff", "1.25"])).cfg_cutoff == 1.25


def test_healthz_and_stats(server):
    code, body = _get(server + "/healthz")
    assert code == 200 and json.loads(body)["ok"] is True
    code, body = _get(server + "/stats")
    assert code == 200 and "queue_depth" in json.loads(body)


def test_config_endpoint_reports_live_defaults(server, tiny_tts):
    """/config reports the ACTUAL serving defaults (quant/cache/cutoff all
    changed defaults across rounds — an SLO regression is unexplainable
    without knowing which approximations a server runs)."""
    code, body = _get(server + "/config")
    assert code == 200
    cfg = json.loads(body)
    assert cfg["nfe_steps"] == 2 and cfg["cfg_strength"] == 1.0
    for key in ("cfg_cutoff", "block_cache", "quant", "max_batch",
                "max_streams", "student", "ode_method", "multihost"):
        assert key in cfg, cfg
    assert cfg["multihost"] is False
    # the tiny session TTS is an unquantized DiT → quant reports None.
    # Pin the handler's attribute path too: a tts.dit rename would make
    # the getattr chain report None FOREVER, indistinguishable from this
    # expected value — so assert the path resolves on the live object.
    assert hasattr(tiny_tts, "dit") and hasattr(tiny_tts.dit, "quant")
    assert cfg["quant"] is tiny_tts.dit.quant is None


def test_tts_roundtrip(server):
    code, ctype, body = _post(server + "/tts", {
        "ref_b64": _ref_b64(), "ref_text": "hello there",
        "text": "general kenobi", "seed": 7,
    })
    assert code == 200 and ctype == "audio/wav"
    import io
    import wave as wave_mod

    with wave_mod.open(io.BytesIO(body), "rb") as w:
        assert w.getframerate() == 8000
        assert w.getnframes() > 0


def test_tts_stream(server):
    """Chunked audio/L16 streaming: multi-sentence text arrives as raw PCM,
    decodable and non-trivial in length."""
    code, ctype, body = _post(server + "/tts_stream", {
        "ref_b64": _ref_b64(), "ref_text": "hello there",
        "text": "general kenobi. you are a bold one. back away now.",
        "seed": 7, "max_chars": 20, "chunk_batch": 1,
    })
    assert code == 200
    assert ctype.startswith("audio/L16") and "rate=8000" in ctype
    pcm = np.frombuffer(body, dtype="<i2")
    assert pcm.size > 8000 // 4  # at least a fraction of a second of audio
    assert np.isfinite(pcm.astype(np.float32)).all()


def test_tts_per_request_settings_and_latency_stats(server):
    """nfe_step/cfg_strength in the payload override the engine default for
    just that request; /stats then reports latency percentiles and the
    count of settings variants seen."""
    base = {"ref_b64": _ref_b64(), "ref_text": "hello there",
            "text": "general kenobi", "seed": 7}
    code, ctype, w_default = _post(server + "/tts", base)
    assert code == 200
    code, ctype, w_fast = _post(server + "/tts",
                                {**base, "nfe_step": 4, "cfg_strength": 0.0})
    assert code == 200 and ctype == "audio/wav"
    assert w_default != w_fast  # different sampler settings → different audio

    code, body = _get(server + "/stats")
    stats = json.loads(body)
    assert stats["settings_variants"] >= 2
    lat = stats["latency"]["request"]
    assert lat["count"] >= 2 and lat["p99_ms"] >= lat["p50_ms"] > 0


def test_tts_stream_ttfb_recorded(server):
    code, ctype, body = _post(server + "/tts_stream", {
        "ref_b64": _ref_b64(), "ref_text": "hello there",
        "text": "general kenobi.", "seed": 5, "nfe_step": 4,
    })
    assert code == 200
    code, body = _get(server + "/stats")
    ttfb = json.loads(body)["latency"]["stream_ttfb"]
    assert ttfb["count"] >= 1 and ttfb["p50_ms"] > 0


def test_tts_stream_chunk_batch_zero_ok(server):
    """chunk_batch <= 0 must be clamped, not turn a valid request into 400."""
    code, ctype, body = _post(server + "/tts_stream", {
        "ref_b64": _ref_b64(), "ref_text": "hello there",
        "text": "general kenobi.", "seed": 3, "chunk_batch": 0,
    })
    assert code == 200 and ctype.startswith("audio/L16")
    assert np.frombuffer(body, dtype="<i2").size > 0


def test_tts_stream_error_is_json(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server + "/tts_stream", {"ref_b64": _ref_b64(), "text": ""})
    assert e.value.code == 400


def test_error_paths(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server + "/tts", {"ref_b64": _ref_b64(), "text": ""})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server + "/nope")
    assert e.value.code == 404


def test_tts_rejects_out_of_range_overrides(server):
    """Per-request overrides are range-validated: a hostile nfe_step would
    otherwise compile an arbitrarily large scan program on the engine worker
    (remote DoS), so it must 400 before reaching the engine."""
    base = {"ref_b64": _ref_b64(), "ref_text": "hello there",
            "text": "general kenobi", "seed": 7}
    for bad in ({"nfe_step": 1000000}, {"nfe_step": 0}, {"nfe_step": "x"},
                {"cfg_strength": -1.0}, {"ode_method": "rk4"},
                {"speed": 0.0}):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server + "/tts", {**base, **bad})
        assert e.value.code == 400, bad


def _base_payload(seed=7):
    return {"ref_b64": _ref_b64(), "ref_text": "hello there",
            "text": "general kenobi", "seed": seed}


def test_queue_shed_times_out_504(server):
    """A request whose engine-side deadline passes while queued is shed
    with a stored builtin TimeoutError → retryable 504 at the HTTP layer.
    queue_timeout_s=0 deterministically trips the dispatch-time check
    (strictly positive queue time always elapses). This drives the stored-
    TimeoutError re-raise through _await_or_cancel — on 3.10 builtin
    TimeoutError is NOT concurrent.futures.TimeoutError, so this is the
    regression test for catching both."""
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server + "/tts", {**_base_payload(), "queue_timeout_s": 0})
    assert e.value.code == 504
    assert b"timed out" in e.value.read()


def test_ttfb_nfe_validation_and_ramp(server):
    """/tts_stream 'ttfb_nfe' out of range → 400 before any synthesis;
    a valid ramp streams fine (chunk 0 at the low NFE, rest at cfg's)."""
    base = {"ref_b64": _ref_b64(), "ref_text": "hello there",
            "text": "general kenobi. you are a bold one.",
            "seed": 7, "max_chars": 20, "nfe_step": 4}
    for bad in (0, 1000):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server + "/tts_stream", {**base, "ttfb_nfe": bad})
        assert e.value.code == 400
    code, ctype, body = _post(server + "/tts_stream",
                              {**base, "ttfb_nfe": 2,
                               "first_chunk_chars": 10})
    assert code == 200 and ctype.startswith("audio/L16")
    assert np.frombuffer(body, dtype="<i2").size > 0


def _raw_post_bytes(path, payload):
    body = json.dumps(payload).encode()
    head = (f"POST {path} HTTP/1.1\r\nHost: t\r\n"
            f"Content-Type: application/json\r\n"
            f"Content-Length: {len(body)}\r\nConnection: close\r\n\r\n")
    return head.encode() + body


def _stall_worker(tts):
    """Patch the synthesizer so the engine worker blocks inside the batch
    call until the returned ``gate`` is set — freezes dispatch so
    queued-state behavior can be tested deterministically. ``entered`` is
    set (before blocking) once the worker is INSIDE the stalled call, and
    ``collected`` records each batch's request seeds — tests synchronize on
    entry instead of polling queue depth (depth 0 is also the initial
    state, so a depth poll is vacuous on this 1-CPU host)."""
    import types

    gate = threading.Event()
    entered = threading.Event()
    collected = []
    synth = tts.synth
    orig = synth.synthesize_requests

    def slow(self, requests, cfg=None):
        collected.append([r.get("seed") for r in requests])
        entered.set()
        gate.wait(timeout=60)
        return orig(requests, cfg=cfg)

    synth.synthesize_requests = types.MethodType(slow, synth)
    return gate, synth, orig, entered, collected


def test_disconnect_cancels_queued_request(server, server_engine, tiny_tts):
    """HTTP-level client-disconnect: close the socket while the request is
    still queued (worker stalled on another batch) → the 0.25 s socket
    watch in _await_or_cancel cancels it in the engine (shed counter
    increments, queue slot freed) instead of the device computing for a
    vanished client."""
    import socket as socket_mod
    import time
    import urllib.parse

    engine = server_engine
    gate, synth, orig, entered, collected = _stall_worker(tiny_tts)
    occupier = threading.Thread(
        target=lambda: _post(server + "/tts", _base_payload(seed=21)),
        daemon=True)
    try:
        occupier.start()
        # synchronize on ENTRY into the stalled batch call — polling
        # depth()==0 is vacuous (that's also the pre-submit state) and a
        # fixed sleep raced the occupier on this 1-CPU host
        assert entered.wait(timeout=30), "worker never entered batch call"
        assert collected and collected[0] == [21], \
            f"stalled batch should hold only the occupier, got {collected}"

        shed0 = engine.stats()["shed"]["cancelled"]
        host = urllib.parse.urlparse(server)
        sock = socket_mod.create_connection((host.hostname, host.port),
                                            timeout=30)
        sock.sendall(_raw_post_bytes("/tts", _base_payload(seed=22)))
        # wait for the request to reach the engine queue, then vanish
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline and engine.batcher.depth() < 1:
            time.sleep(0.02)
        assert engine.batcher.depth() >= 1, "request never queued"
        sock.close()

        deadline = time.monotonic() + 30
        while (time.monotonic() < deadline
               and engine.stats()["shed"]["cancelled"] <= shed0):
            time.sleep(0.05)
        assert engine.stats()["shed"]["cancelled"] > shed0
        assert engine.batcher.depth() == 0  # queue slot freed
    finally:
        gate.set()
        synth.synthesize_requests = orig
        occupier.join(timeout=120)


def test_half_close_client_still_served(server):
    """A client that legally half-closes its write side after the body
    (shutdown(SHUT_WR)) keeps its request alive by declaring
    "half_close": true — the EOF watch is disabled and the full response
    arrives on the still-open read side."""
    import socket as socket_mod
    import urllib.parse

    host = urllib.parse.urlparse(server)
    sock = socket_mod.create_connection((host.hostname, host.port),
                                        timeout=300)
    payload = {**_base_payload(seed=23), "half_close": True}
    sock.sendall(_raw_post_bytes("/tts", payload))
    sock.shutdown(socket_mod.SHUT_WR)  # FIN: done sending, still reading
    buf = b""
    while True:
        chunk = sock.recv(65536)
        if not chunk:
            break
        buf += chunk
    sock.close()
    head, _, body = buf.partition(b"\r\n\r\n")
    assert head.split(b"\r\n")[0].endswith(b"200 OK"), head[:200]
    assert b"audio/wav" in head
    assert body[:4] == b"RIFF"  # a complete WAV came back post-half-close


def test_block_cache_flag_resolution_and_override():
    """--block_cache 'default' → SERVING_BLOCK_CACHE; '0' → off; explicit
    spec → itself. Per-request 'block_cache' overrides validate."""
    import dataclasses

    from lemas_tts_tpu.config import SERVING_BLOCK_CACHE, SamplerConfig

    parse = serve_http.build_parser().parse_args
    resolve = serve_http.sampler_config_from_args
    assert resolve(parse([])).block_cache == SERVING_BLOCK_CACHE
    assert resolve(parse(["--block_cache", "0"])).block_cache is None
    assert resolve(parse(["--block_cache", "4-18:3"])).block_cache == "4-18:3"

    base = SamplerConfig()
    cfg = serve_http._request_cfg(base, {"block_cache": "2-14:2"})
    assert cfg.block_cache == "2-14:2"
    cfg = serve_http._request_cfg(
        dataclasses.replace(base, block_cache="2-20:2"), {"block_cache": "0"})
    assert cfg.block_cache is None
    import pytest

    with pytest.raises(ValueError):
        serve_http._request_cfg(base, {"block_cache": "14-2:2"})
    with pytest.raises(ValueError):
        serve_http._request_cfg(base, {"block_cache": "0-65:2"})
    with pytest.raises(ValueError):
        serve_http._request_cfg(base, {"block_cache": "junk"})
    # every/head/tail are program-space dimensions too — bounded against
    # compile-DoS like nfe_step
    for bad in ("2-20:9", "2-20:2+t65", "2-20:2+h65"):
        with pytest.raises(ValueError):
            serve_http._request_cfg(base, {"block_cache": bad})


def test_tts_block_cache_request_roundtrip(server):
    """A per-request block_cache spec valid at the tiny model's depth runs
    the cached sampler through the whole engine path and returns audio;
    cache on/off produce different (finite) waveforms at the same seed."""
    base = {"ref_b64": _ref_b64(), "ref_text": "hello there",
            "text": "general kenobi", "seed": 11, "nfe_step": 4}
    code, ctype, w_exact = _post(server + "/tts", {**base, "block_cache": "0"})
    assert code == 200 and ctype == "audio/wav"
    code, ctype, w_cached = _post(server + "/tts",
                                  {**base, "block_cache": "0-1:2"})
    assert code == 200 and ctype == "audio/wav"
    assert w_cached != w_exact  # the skip branch actually engaged


def test_request_trace_records(server, server_engine):
    """Per-request observability (VERDICT r4 item 8): with tracing enabled
    the engine emits one schema-checked request_trace per /tts request and
    the HTTP layer one stream_trace per stream — every documented field
    present, latency stages attributable."""
    import io

    from lemas_tts_tpu.utils.profiling import (
        REQUEST_TRACE_FIELDS,
        STREAM_TRACE_FIELDS,
        JsonLogger,
    )

    engine = server_engine
    buf = io.StringIO()
    old_log, old_flag = engine.log, engine.trace_requests
    engine.log = JsonLogger(stream=buf)
    engine.trace_requests = True
    try:
        code, ctype, _ = _post(server + "/tts", _base_payload(seed=71))
        assert code == 200
        code, ctype, _ = _post(server + "/tts_stream",
                               {**_base_payload(seed=72), "max_chars": 20,
                                "text": "general kenobi. you are a bold "
                                        "one. back away now."})
        assert code == 200
    finally:
        engine.log = old_log
        engine.trace_requests = old_flag
    records = [json.loads(ln) for ln in buf.getvalue().splitlines()]
    req_traces = [r for r in records if r["event"] == "request_trace"]
    stream_traces = [r for r in records if r["event"] == "stream_trace"]
    assert req_traces and stream_traces
    r = req_traces[-1]
    assert set(REQUEST_TRACE_FIELDS) <= set(r), r
    assert r["outcome"] == "ok" and r["batch_size"] >= 1
    assert r["device_ms"] > 0 and r["total_ms"] >= r["device_ms"]
    assert r["queue_wait_ms"] >= 0 and r["dur_bucket"] > 0
    s = stream_traces[-1]
    assert set(STREAM_TRACE_FIELDS) <= set(s), s
    assert s["outcome"] == "ok" and s["n_chunks"] >= 2
    assert 0 < s["ttfb_ms"] <= s["total_ms"]


def test_resolve_quant_grammar():
    """One quant-knob grammar everywhere (review finding: divergent
    per-CLI copies let LEMAS_SERVING_QUANT=none crash serve_http at
    warmup with 'unknown quantization mode')."""
    from lemas_tts_tpu.config import SERVING_QUANT, resolve_quant

    for off in (None, "", "none", "0", "off", "NONE", " none "):
        assert resolve_quant(off) is None, off
    assert resolve_quant("default") == SERVING_QUANT
    assert resolve_quant("int8") == "int8"
    assert resolve_quant("int8_ff") == "int8_ff"


def test_warmup_auto_buckets_cover_padded_batch(tiny_tts):
    """--warmup_batches auto with a non-bucket max_batch (6) must warm the
    bucket real full batches PAD INTO (8), not stop at 4 (review finding:
    `<= max_batch` left the first full batch to compile mid-traffic)."""
    from lemas_tts_tpu.infer.pipeline import BATCH_BUCKETS, pick_bucket

    top = pick_bucket(6, BATCH_BUCKETS)
    assert top == 8
    bb = tuple(b for b in BATCH_BUCKETS if b <= top)
    assert 8 in bb
