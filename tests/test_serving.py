"""Serving engine: cross-request batching, futures, profiling, gradio gating."""

import threading
import warnings
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lemas_tts_tpu.config import DiTArch, MelSpecConfig, SamplerConfig
from lemas_tts_tpu.infer.pipeline import Synthesizer
from lemas_tts_tpu.models.dit import DiT
from lemas_tts_tpu.models.vocos import Vocos
from lemas_tts_tpu.serve import ServingEngine, TTSRequest
from lemas_tts_tpu.utils.vocab import Vocab


@pytest.fixture(scope="module")
def synth():
    mel_cfg = MelSpecConfig(n_mel_channels=20, n_fft=256, win_length=256,
                            hop_length=64, target_sample_rate=8000)
    arch = DiTArch(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2,
                   text_dim=32, conv_layers=1)
    vocab = Vocab(char_map={c: i for i, c in enumerate(" abcdefghij")}, size=11)
    dit = DiT(arch=arch, mel_dim=20, text_num_embeds=vocab.size)
    key = jax.random.key(0)
    dparams = dit.init(key, jnp.zeros((1, 32, 20)), jnp.zeros((1, 32, 20)),
                       jnp.zeros((1, 8), jnp.int32), jnp.zeros((1,)))
    voc = Vocos(input_channels=20, dim=32, intermediate_dim=64, num_layers=2,
                n_fft=256, hop_length=64)
    vparams = voc.init(key, jnp.zeros((1, 20, 16)))
    return Synthesizer(dit, dparams, voc, vparams, vocab, mel_cfg)


def _req(seed, sr=8000, text="abc def"):
    rng = np.random.default_rng(seed)
    wav = (0.2 * rng.standard_normal(sr)).astype(np.float32)
    return dict(ref_wav=wav, ref_sr=sr, ref_units="abde ",
                gen_units=text, seed=seed)


def test_synthesize_requests_multi_ref(synth):
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0)
    reqs = [_req(1), _req(2, text="ghi"), _req(3, text="abc abc abc")]
    results = synth.synthesize_requests(reqs, cfg=cfg)
    assert len(results) == 3
    for wave, sr, mel in results:
        assert sr == 8000 and wave.size > 0 and np.isfinite(wave).all()
        assert mel.shape[0] == 20
    # different refs/texts → different outputs
    assert results[0][0].shape != results[2][0].shape or not np.allclose(
        results[0][0], results[2][0]
    )


def test_synthesize_requests_batch_invariant(synth):
    """A request's result must not depend on what else is in the batch."""
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0)
    solo = synth.synthesize_requests([_req(7)], cfg=cfg)[0]
    packed = synth.synthesize_requests([_req(7), _req(8), _req(9)], cfg=cfg)[0]
    np.testing.assert_allclose(solo[0], packed[0], atol=1e-4)


def test_engine_end_to_end(synth):
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0)
    eng = ServingEngine(synth, cfg=cfg, max_batch=4, max_wait_ms=30)
    try:
        futures = [
            eng.submit(TTSRequest(**_req(s))) for s in (11, 12, 13, 14, 15)
        ]
        results = [f.result(timeout=120) for f in futures]
        for wave, sr, _ in results:
            assert sr == 8000 and wave.size > 0 and np.isfinite(wave).all()
        stats = eng.stats()
        assert stats["timers"]["serve.batch"]["count"] >= 1
        assert stats["queue_depth"] == 0
    finally:
        eng.shutdown()


def test_engine_concurrent_clients(synth):
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0)
    eng = ServingEngine(synth, cfg=cfg, max_batch=8, max_wait_ms=20)
    results = {}

    def client(seed):
        results[seed] = eng.synthesize(**_req(seed), timeout=120)

    try:
        threads = [threading.Thread(target=client, args=(s,)) for s in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 4
        for wave, sr, _ in results.values():
            assert np.isfinite(wave).all()
    finally:
        eng.shutdown()


def test_engine_per_request_settings(synth):
    """Per-request SamplerConfig: requests carrying their own settings are
    batched apart from default-settings traffic (composite bucket) and get
    bit-identical results to calling the synthesizer with that cfg directly;
    latency percentiles show up in stats."""
    base = SamplerConfig(nfe_steps=2, cfg_strength=1.0)
    fast = SamplerConfig(nfe_steps=4, cfg_strength=1.0)
    eng = ServingEngine(synth, cfg=base, max_batch=4, max_wait_ms=30)
    try:
        f_default = eng.submit(TTSRequest(**_req(21)))
        f_override = eng.submit(TTSRequest(**_req(21), cfg=fast))
        w_default = f_default.result(timeout=120)[0]
        w_override = f_override.result(timeout=120)[0]
        # same seed, different NFE → different trajectories
        assert w_default.shape != w_override.shape or \
            not np.allclose(w_default, w_override)
        # engine result == direct synthesis with the same cfg (per batch)
        direct = synth.synthesize_requests([_req(21)], cfg=fast)[0][0]
        np.testing.assert_allclose(w_override, direct, atol=1e-5)
        stats = eng.stats()
        assert stats["settings_variants"] == 2
        lat = stats["latency"]["request"]
        assert lat["count"] >= 2 and lat["p99_ms"] >= lat["p50_ms"] > 0
    finally:
        eng.shutdown()


def test_engine_bucket_matches_synthesizer_estimate(synth):
    """The engine's batch key derives from Synthesizer.estimate_bucket — the
    single source of truth shared with the synthesis paths."""
    from lemas_tts_tpu.serve.engine import _BUCKET_STRIDE

    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0)
    eng = ServingEngine(synth, cfg=cfg)
    try:
        r = TTSRequest(**_req(1))
        expect = synth.estimate_bucket(r.ref_wav, r.ref_sr, r.ref_units,
                                       r.gen_units, cfg)
        composite, dur_bucket = eng._estimate_bucket(r)
        assert composite % _BUCKET_STRIDE == expect
        # the batcher cost budget is in frames — the duration bucket, not
        # the composite key
        assert dur_bucket == expect
        # default-cfg requests use settings id 0 → bucket == duration bucket
        assert composite == expect
    finally:
        eng.shutdown()


def test_engine_shutdown_rejects(synth):
    eng = ServingEngine(synth, cfg=SamplerConfig(nfe_steps=2))
    eng.shutdown()
    with pytest.raises(RuntimeError):
        eng.submit(TTSRequest(**_req(1)))


def test_gradio_script_gated():
    from lemas_tts_tpu.scripts import inference_gradio

    try:
        import gradio  # noqa: F401

        pytest.skip("gradio installed — gating not exercised")
    except ImportError:
        pass
    rc = inference_gradio.main(["--port", "7999"])
    assert rc == 2  # clean refusal, not a crash


def test_stage_timers_and_json_logger(tmp_path):
    from lemas_tts_tpu.utils.profiling import JsonLogger, StageTimers

    t = StageTimers()
    with t.stage("x"):
        pass
    with t.stage("x"):
        pass
    snap = t.snapshot()
    assert snap["x"]["count"] == 2 and snap["x"]["mean_s"] >= 0
    assert "x" in t.report()

    p = tmp_path / "log.jsonl"
    log = JsonLogger(path=str(p))
    log.log("evt", a=1)
    import json

    rec = json.loads(p.read_text().strip())
    assert rec["event"] == "evt" and rec["a"] == 1


@pytest.mark.slow
def test_engine_on_device_mesh():
    """Continuous-batching serving over an 8-device data-parallel mesh:
    params replicated, request batches sharded over 'data', results match the
    single-device engine (SURVEY §2.3 scaling axis)."""
    import jax
    import jax.numpy as jnp

    from lemas_tts_tpu.parallel.mesh import make_mesh

    mel_cfg = MelSpecConfig(n_mel_channels=20, n_fft=256, win_length=256,
                            hop_length=64, target_sample_rate=8000)
    arch = DiTArch(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2,
                   text_dim=32, conv_layers=1)
    vocab = Vocab(char_map={c: i for i, c in enumerate(" abcdefghij")}, size=11)
    dit = DiT(arch=arch, mel_dim=20, text_num_embeds=vocab.size)
    key = jax.random.key(0)
    dparams = dit.init(key, jnp.zeros((1, 32, 20)), jnp.zeros((1, 32, 20)),
                       jnp.zeros((1, 8), jnp.int32), jnp.zeros((1,)))
    voc = Vocos(input_channels=20, dim=32, intermediate_dim=64, num_layers=2,
                n_fft=256, hop_length=64)
    vparams = voc.init(key, jnp.zeros((1, 20, 16)))

    mesh = make_mesh(8, model_parallel=1)
    sh = Synthesizer(dit, dparams, voc, vparams, vocab, mel_cfg, mesh=mesh)
    s1 = Synthesizer(dit, dparams, voc, vparams, vocab, mel_cfg)
    assert sh._pick_batch(3) % 8 == 0

    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0)
    reqs = [_req(s) for s in (21, 22, 23)]
    res_mesh = sh.synthesize_requests(reqs, cfg=cfg)
    res_single = s1.synthesize_requests(reqs, cfg=cfg)
    for (wm, srm, _), (ws, srs, _) in zip(res_mesh, res_single):
        assert srm == srs
        np.testing.assert_allclose(wm, ws, atol=2e-4)

    eng = ServingEngine(sh, cfg=cfg, max_batch=8, max_wait_ms=20)
    try:
        futs = [eng.submit(TTSRequest(**_req(s))) for s in (31, 32, 33, 34)]
        for f in futs:
            w, sr, _ = f.result(timeout=180)
            assert sr == 8000 and np.isfinite(w).all()
    finally:
        eng.shutdown()


def test_engine_poison(synth):
    """Backend degradation contract (multihost follower death path): poison
    fails queued AND in-flight futures immediately — without the worker
    thread's cooperation — rejects new submits with a 503-mapped
    RuntimeError, and keeps stats answering with the degraded reason."""
    import types

    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0)
    eng = ServingEngine(synth, cfg=cfg, max_batch=1, max_wait_ms=10)
    gate = threading.Event()
    entered = threading.Event()
    orig = synth.synthesize_requests

    def wedged(self, requests, cfg=None):
        entered.set()
        gate.wait(timeout=60)  # simulate a dead fleet's stuck collective
        return orig(requests, cfg=cfg)

    synth.synthesize_requests = types.MethodType(wedged, synth)
    try:
        inflight = eng.submit(TTSRequest(**_req(61)))
        assert entered.wait(timeout=30)
        queued = eng.submit(TTSRequest(**_req(62)))
        exc = RuntimeError("multihost fleet degraded: follower 1 died")
        eng.poison(exc)
        for fut in (inflight, queued):
            with pytest.raises(RuntimeError, match="degraded"):
                fut.result(timeout=5)
        with pytest.raises(RuntimeError, match="degraded"):
            eng.submit(TTSRequest(**_req(63)))
        assert "degraded" in eng.stats()["degraded"]
        # idempotent; late worker completion must not corrupt done futures
        eng.poison(RuntimeError("second reason (ignored)"))
        gate.set()
    finally:
        gate.set()
        synth.synthesize_requests = orig
        eng.shutdown()


def test_multihost_proxy_single_process(synth):
    """serve/multihost.py contracts on a 1-process 'fleet' (the broadcast
    channel degenerates to self-delivery, so this runs in the fast profile;
    the real 2-process case is the slow test_two_process_serving): the
    proxy pins missing seeds WITHOUT mutating the caller's dicts, results
    match a direct Synthesizer call, dispatch/warmup counters advance, and
    aggregated stats report lockstep."""
    from lemas_tts_tpu.serve.multihost import (
        BroadcastSynthesizer,
        MultiHostDispatch,
    )

    d = MultiHostDispatch(synth)
    proxy = BroadcastSynthesizer(d)
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0)

    r_seeded, r_unseeded = _req(5), dict(_req(6), seed=None)
    res = proxy.synthesize_requests([r_seeded, r_unseeded], cfg)
    assert len(res) == 2
    for wave, sr, _ in res:
        assert sr == 8000 and np.isfinite(wave).all() and wave.size > 0
    # the caller's dict is untouched; only the broadcast copy got a seed
    assert r_unseeded["seed"] is None
    # a seeded row through the proxy == the same row direct (payload intact)
    direct = synth.synthesize_requests([_req(5)], cfg=cfg)[0]
    np.testing.assert_allclose(res[0][0], direct[0], atol=1e-5)

    # bucket estimation delegates (host-only, no broadcast)
    r = _req(7)
    assert proxy.estimate_bucket(r["ref_wav"], r["ref_sr"], r["ref_units"],
                                 r["gen_units"], cfg) == \
        synth.estimate_bucket(r["ref_wav"], r["ref_sr"], r["ref_units"],
                              r["gen_units"], cfg)

    proxy.warmup(cfg, duration_buckets=(128,), text_buckets=(32,),
                 batch_buckets=(1,))
    assert d.dispatches == 1 and d.warmups == 1
    stats = d.aggregated_stats()
    assert stats["processes"] == 1 and stats["in_lockstep"]
    assert stats["per_process"][0]["dispatches"] == 1


def test_synthesizer_thread_safety(synth):
    """Direct concurrent use of one Synthesizer from many threads (the
    reference's equivalent path had a ThreadPool text-cache data race,
    SURVEY §5); here the only shared mutable state is the locked program
    cache, and concurrent results match serial ones."""
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0)
    serial = {
        s: synth.synthesize_requests([_req(s)], cfg=cfg)[0][0]
        for s in range(41, 45)
    }
    results = {}
    errs = []

    def worker(s):
        try:
            results[s] = synth.synthesize_requests([_req(s)], cfg=cfg)[0][0]
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(41, 45)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    for s in range(41, 45):
        np.testing.assert_allclose(results[s], serial[s], atol=1e-5)


def test_warmup_precompiles(synth):
    """warmup() compiles the bucket programs; a following request with the
    same shapes reuses them (measurably faster than a cold compile)."""
    import time

    from lemas_tts_tpu.config import SamplerConfig

    cfg = SamplerConfig(nfe_steps=3, cfg_strength=1.5)
    n = synth.warmup(cfg, duration_buckets=(256,), text_buckets=(64,),
                     batch_buckets=(1,))
    assert n == 1
    t0 = time.perf_counter()
    out = synth.synthesize_requests([_req(99, text="abc")], cfg=cfg)
    warm_time = time.perf_counter() - t0
    assert np.isfinite(out[0][0]).all()
    # warm path must be far below CPU compile cost (which is seconds)
    assert warm_time < 5.0, warm_time


def test_engine_backpressure(synth):
    """A full queue rejects new submits instead of growing unboundedly."""
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0)
    eng = ServingEngine(synth, cfg=cfg, max_batch=1, max_wait_ms=1,
                        max_queue=2)
    try:
        subs = []
        rejected = 0
        for s in range(61, 70):
            try:
                subs.append(eng.submit(TTSRequest(**_req(s))))
            except RuntimeError as e:
                assert "queue full" in str(e)
                rejected += 1
        assert rejected >= 1  # backpressure engaged
        for f in subs:  # accepted requests still complete
            w, sr, _ = f.result(timeout=180)
            assert np.isfinite(w).all()
    finally:
        eng.shutdown()


def test_gradio_helpers_without_gradio():
    """get_tts caches per config key; system_stats reports devices — both run
    without gradio installed."""
    from lemas_tts_tpu.scripts.inference_gradio import (
        _model_cache,
        get_tts,
        system_stats,
    )

    stats = system_stats()
    assert "jax backend" in stats and "devices" in stats

    import warnings
    from pathlib import Path

    tiny = str(Path(__file__).parent / "data" / "tiny.yaml")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        a = get_tts(tiny, "", "", device="cpu")
        b = get_tts(tiny, "", "", device="cpu")
    assert a is b  # persistent cache (no per-request rebuilds)
    assert any(k[0] == tiny for k in _model_cache)


def test_engine_propagates_batch_errors(synth):
    """A failing device batch must reject the affected futures with the
    exception (not hang clients) and keep the engine alive for later work."""
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0)
    eng = ServingEngine(synth, cfg=cfg, max_batch=4, max_wait_ms=10)
    original = synth.synthesize_requests
    calls = {"n": 0}

    def flaky(requests, cfg=cfg):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected device failure")
        return original(requests, cfg=cfg)

    synth.synthesize_requests = flaky
    try:
        bad = eng.submit(TTSRequest(**_req(71)))
        with pytest.raises(RuntimeError, match="injected"):
            bad.result(timeout=60)
        # engine still serves subsequent requests
        good = eng.submit(TTSRequest(**_req(72)))
        w, sr, _ = good.result(timeout=120)
        assert sr == 8000 and np.isfinite(w).all()
    finally:
        synth.synthesize_requests = original
        eng.shutdown()


def test_cancelled_future_does_not_poison_batch(synth):
    """A client cancelling its future must not fail the other rows of the
    same batch (review finding: set_result on a cancelled future raised
    InvalidStateError inside the shared try)."""
    from lemas_tts_tpu.config import SamplerConfig
    from lemas_tts_tpu.serve.engine import ServingEngine, TTSRequest

    eng = ServingEngine(synth, cfg=SamplerConfig(nfe_steps=2, cfg_strength=1.0),
                        max_batch=4, max_wait_ms=200)
    try:
        sr = 8000
        ref = (0.2 * np.sin(2 * np.pi * 150 * np.arange(sr) / sr)).astype(np.float32)
        reqs = [TTSRequest(ref_wav=ref, ref_sr=sr, ref_units=list("ab"),
                           gen_units=list("cde"), seed=i) for i in range(3)]
        futs = [eng.submit(r) for r in reqs]
        assert futs[0].cancel() or futs[0].done()
        for f in futs[1:]:
            wave = f.result(timeout=300)[0]
            assert np.isfinite(np.asarray(wave)).all()
    finally:
        eng.shutdown()


@pytest.mark.parametrize("force_python", [False, True])
def test_batcher_cancel(force_python):
    """cancel() removes a still-queued request (both backends) and frees
    queue depth; unknown / already-collected ids return False."""
    from lemas_tts_tpu.native.batcher import Batcher

    b = Batcher(max_batch=4, max_wait_ms=0, force_python=force_python)
    try:
        r1 = b.submit(bucket=1024, cost=1)
        r2 = b.submit(bucket=1024, cost=1)
        assert b.depth() == 2
        assert b.cancel(r1) is True
        assert b.depth() == 1
        ids, bucket = b.next_batch(timeout_ms=100)
        assert ids == [r2] and bucket == 1024
        assert b.cancel(r2) is False  # already collected
        assert b.cancel(999_999) is False  # unknown
    finally:
        b.close()


@pytest.mark.parametrize("force_python", [False, True])
def test_batcher_mixed_bucket_fairness_under_overload(force_python):
    """Open-loop overload across mixed shape buckets: dispatch follows each
    bucket's oldest queued request (oldest-head-first), so no bucket starves.
    Invariant: the sequence of per-batch oldest submit indices is
    nondecreasing across consecutive batches."""
    import time as _time

    from lemas_tts_tpu.native.batcher import Batcher

    b = Batcher(max_batch=2, max_wait_ms=0, force_python=force_python)
    try:
        rng = np.random.default_rng(0)
        buckets = [256, 512, 1024]
        submit_idx = {}
        for i in range(48):  # Poisson-ish arrival mix, all queued up front
            rid = b.submit(bucket=buckets[int(rng.integers(3))], cost=1)
            submit_idx[rid] = i
            _time.sleep(0.001)  # separate µs-resolution enqueue timestamps
        heads, seen_buckets = [], set()
        while b.depth():
            ids, bucket = b.next_batch(timeout_ms=100)
            assert ids
            heads.append(min(submit_idx[r] for r in ids))
            seen_buckets.add(bucket)
        assert heads == sorted(heads), heads
        assert seen_buckets == set(buckets)  # every bucket served
    finally:
        b.close()


def test_engine_cancel_and_timeout_shedding(synth):
    """Engine overload robustness: a cancelled queued request never reaches
    the device (shed at the batcher), and a request whose engine-side
    deadline passed in the queue is shed at dispatch with TimeoutError —
    both visible in stats()['shed']."""
    import time as _time

    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0)
    eng = ServingEngine(synth, cfg=cfg, max_batch=1, max_wait_ms=1)
    original = synth.synthesize_requests
    gate = threading.Event()
    ran_seeds = []

    def gated(requests, cfg=cfg):
        ran_seeds.extend(r["seed"] for r in requests)
        gate.wait(timeout=60)
        return original(requests, cfg=cfg)

    synth.synthesize_requests = gated
    try:
        f1 = eng.submit(TTSRequest(**_req(81)))
        # while the worker is blocked inside f1's batch, f2/f3 stay queued
        f2 = eng.submit(TTSRequest(**_req(82)))
        f3 = eng.submit(TTSRequest(**_req(83), timeout=1e-3))
        assert eng.cancel(f2) is True
        assert f2.cancelled()
        _time.sleep(0.05)  # let f3's deadline lapse while queued
        gate.set()
        w, sr, _ = f1.result(timeout=120)
        assert np.isfinite(w).all()
        with pytest.raises(TimeoutError):
            f3.result(timeout=60)
        # the device only ever ran work someone was waiting for
        deadline = _time.time() + 10
        while _time.time() < deadline and eng.batcher.depth():
            _time.sleep(0.01)
        assert ran_seeds == [81]
        shed = eng.stats()["shed"]
        assert shed["cancelled"] >= 1 and shed["timed_out"] >= 1
    finally:
        synth.synthesize_requests = original
        eng.shutdown()


def test_engine_cancel_unknown_future(synth):
    from concurrent.futures import Future

    eng = ServingEngine(synth, cfg=SamplerConfig(nfe_steps=2))
    try:
        f = Future()
        assert eng.cancel(f) is True  # never submitted → trivially cancelled
        assert f.cancelled()
    finally:
        eng.shutdown()


def test_estimate_bucket_stereo_matches_mono(synth):
    from lemas_tts_tpu.config import SamplerConfig
    from lemas_tts_tpu.serve.engine import ServingEngine, TTSRequest

    eng = ServingEngine(synth, cfg=SamplerConfig(nfe_steps=2))
    try:
        sr = 8000
        mono = np.zeros(4 * sr, np.float32)
        stereo = np.zeros((2, 4 * sr), np.float32)
        req_m = TTSRequest(ref_wav=mono, ref_sr=sr, ref_units=list("ab"),
                           gen_units=list("cde"))
        req_s = TTSRequest(ref_wav=stereo, ref_sr=sr, ref_units=list("ab"),
                           gen_units=list("cde"))
        assert eng._estimate_bucket(req_m) == eng._estimate_bucket(req_s)  # (composite, dur) tuples
    finally:
        eng.shutdown()


def test_engine_caps_distinct_settings(synth):
    """Each distinct per-request settings tuple pins compiled programs for
    the engine's lifetime — the set must be bounded (RuntimeError → 503 at
    the HTTP layer), or a client sweeping values leaks compiles forever."""
    from lemas_tts_tpu.serve.engine import _MAX_CFG_IDS

    eng = ServingEngine(synth, cfg=SamplerConfig(nfe_steps=2))
    try:
        r = TTSRequest(**_req(1))
        for i in range(_MAX_CFG_IDS - 1):  # id 0 = the engine default cfg
            r.cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0 + 0.001 * i)
            eng._estimate_bucket(r)
        r.cfg = SamplerConfig(nfe_steps=2, cfg_strength=99.0)
        with pytest.raises(RuntimeError, match="distinct sampler settings"):
            eng._estimate_bucket(r)
        # already-seen settings still resolve fine at the cap
        r.cfg = None
        eng._estimate_bucket(r)
    finally:
        eng.shutdown()


def test_estimate_bucket_matches_actual_program_shape(synth, monkeypatch):
    """estimate_bucket must predict the exact duration bucket
    synthesize_requests compiles for — including the token-count/cond-frame
    floor — or the engine groups requests into batches whose program shape
    they then miss (recompile + padding waste)."""
    import lemas_tts_tpu.infer.pipeline as pl

    rec = []
    orig = pl.pick_bucket

    def spy(v, buckets):
        r = orig(v, buckets)
        if buckets is pl.DURATION_BUCKETS:
            rec.append(r)
        return r

    monkeypatch.setattr(pl, "pick_bucket", spy)
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=0.0)
    # short ref + long text: the +1/token floor, not the rate extrapolation,
    # decides the bucket
    for req in (_req(1, text="abc def " * 40), _req(2), _req(3, sr=7900)):
        est = synth.estimate_bucket(req["ref_wav"], req["ref_sr"],
                                    req["ref_units"], req["gen_units"], cfg)
        rec.clear()
        synth.synthesize_requests([req], cfg=cfg)
        assert rec and rec[0] == est


def test_dispatch_warmup_covers_buckets(synth):
    """dispatch_warmup drives the REAL synthesize_requests path once per
    reachable (duration bucket × batch bucket) — the warm that also pre-pays
    the per-shape first-dispatch re-trace (jit caches key on argument
    commitment; Synthesizer.warmup's synthetic arrays miss that cache
    entry, measured as a ~10 s loaded-TTFB tail through the tunnel)."""
    from lemas_tts_tpu.infer import pipeline as pl

    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0)
    seen = []
    orig = synth.synthesize_requests

    def spy(requests, cfg):
        seen.append((len(requests),
                     synth.estimate_bucket(requests[0]["ref_wav"],
                                           requests[0]["ref_sr"],
                                           requests[0]["ref_units"],
                                           requests[0]["gen_units"], cfg)))
        return orig(requests, cfg=cfg)

    synth.synthesize_requests = spy
    try:
        n = pl.dispatch_warmup(synth, cfg, duration_buckets=(512, 768),
                               batch_buckets=(1, 2))
    finally:
        synth.synthesize_requests = orig
    assert n == len(seen) == 4
    assert sorted(seen) == [(1, 512), (1, 768), (2, 512), (2, 768)]
    # an unreachable bucket (text budget too small to ever land there) is
    # skipped, not mis-warmed
    assert pl.dispatch_warmup(synth, cfg, duration_buckets=(4096,),
                              batch_buckets=(1,), max_text_chars=64) == 0
