"""Native C++ runtime components: audio DSP library + serving batcher.

Skipped gracefully when no toolchain is available (the Python fallbacks are
covered by the rest of the suite)."""

import threading
import time

import numpy as np
import pytest

from lemas_tts_tpu.native.audio import (
    native_available,
    rms,
    resample,
    scan_dbfs,
    wav_decode,
    wav_encode,
)
from lemas_tts_tpu.native.batcher import Batcher

needs_native = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@needs_native
def test_wav_roundtrip_pcm16():
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    blob = wav_encode(x, sr)
    dec, dsr = wav_decode(blob)
    assert dsr == sr and dec.shape == (1, sr)
    assert np.abs(dec[0] - x).max() < 2e-4  # PCM16 quantization


@needs_native
def test_wav_decode_matches_python_reader(tmp_path):
    from lemas_tts_tpu.utils.audio_io import read_audio, write_wav

    sr = 8000
    rng = np.random.default_rng(0)
    x = (0.3 * rng.standard_normal(sr)).astype(np.float32)
    p = tmp_path / "x.wav"
    write_wav(str(p), x, sr)
    py, py_sr = read_audio(str(p))
    nat, nat_sr = wav_decode(p.read_bytes())
    assert nat_sr == py_sr
    np.testing.assert_allclose(np.squeeze(nat), np.squeeze(py), atol=1e-6)


@needs_native
def test_wav_stereo():
    sr = 8000
    x = np.stack([np.ones(100, np.float32) * 0.5, -np.ones(100, np.float32) * 0.5])
    dec, _ = wav_decode(wav_encode(x, sr))
    assert dec.shape == (2, 100)
    assert dec[0].mean() > 0.49 and dec[1].mean() < -0.49


@needs_native
def test_resample_matches_jax_kernel():
    import jax.numpy as jnp

    from lemas_tts_tpu.ops.resample import resample as jresample

    rng = np.random.default_rng(1)
    x = (0.5 * rng.standard_normal(4000)).astype(np.float32)
    for orig, new in ((16000, 24000), (24000, 16000), (44100, 24000)):
        rn = resample(x, orig, new)
        rj = np.asarray(jresample(jnp.asarray(x), orig, new))
        n = min(len(rn), len(rj))
        assert abs(len(rn) - len(rj)) <= 1
        np.testing.assert_allclose(rn[:n], rj[:n], atol=5e-4)


@needs_native
def test_rms_and_dbfs():
    x = np.full(1000, 0.1, np.float32)
    assert abs(rms(x) - 0.1) < 1e-6
    sr = 8000
    sig = np.concatenate([np.zeros(sr, np.float32),
                          np.full(sr, 0.5, np.float32)])
    prof = scan_dbfs(sig, sr, 1000, 10)
    assert prof[0] < -100  # silence
    assert prof[-1] > -7  # loud


# ------------------------------------------------------------------ batcher
@pytest.mark.parametrize("force_python", [False, True])
def test_batcher_basic(force_python):
    b = Batcher(max_batch=4, max_wait_ms=5, force_python=force_python)
    ids = [b.submit(bucket=1024, cost=10) for _ in range(6)]
    assert all(i > 0 for i in ids)
    got1, bucket1 = b.next_batch(timeout_ms=200)
    got2, _ = b.next_batch(timeout_ms=200)
    assert got1 == ids[:4] and bucket1 == 1024
    assert got2 == ids[4:]
    assert b.depth() == 0
    b.close()


@pytest.mark.parametrize("force_python", [False, True])
def test_batcher_buckets_not_mixed(force_python):
    b = Batcher(max_batch=8, max_wait_ms=1, force_python=force_python)
    a = b.submit(bucket=512)
    time.sleep(0.002)
    c = b.submit(bucket=1024)
    got1, bucket1 = b.next_batch(timeout_ms=200)
    got2, bucket2 = b.next_batch(timeout_ms=200)
    # one batch per bucket, oldest first
    assert got1 == [a] and bucket1 == 512
    assert got2 == [c] and bucket2 == 1024
    b.close()


@pytest.mark.parametrize("force_python", [False, True])
def test_batcher_max_cost(force_python):
    b = Batcher(max_batch=8, max_cost=25, max_wait_ms=1,
                force_python=force_python)
    ids = [b.submit(bucket=1, cost=10) for _ in range(4)]
    got, _ = b.next_batch(timeout_ms=200)
    assert got == ids[:2]  # 10+10 ≤ 25 < 10+10+10
    b.close()


@pytest.mark.parametrize("force_python", [False, True])
def test_batcher_concurrent_producers(force_python):
    b = Batcher(max_batch=16, max_wait_ms=10, force_python=force_python)
    n_threads, per_thread = 4, 8

    def produce():
        for _ in range(per_thread):
            assert b.submit(bucket=256, cost=1) > 0

    threads = [threading.Thread(target=produce) for _ in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    seen = []
    while True:
        got, _ = b.next_batch(timeout_ms=50)
        if not got:
            break
        seen.extend(got)
    assert sorted(seen) == sorted(set(seen))
    assert len(seen) == n_threads * per_thread
    b.close()


@pytest.mark.parametrize("force_python", [False, True])
def test_batcher_timeout_empty(force_python):
    b = Batcher(max_batch=4, force_python=force_python)
    t0 = time.monotonic()
    got, _ = b.next_batch(timeout_ms=30)
    assert got == [] and time.monotonic() - t0 < 5.0
    b.close()


@needs_native
def test_wav_decode_truncated_file_is_safe():
    """Header claims more data than present → decoder clamps instead of
    reading out of bounds."""
    sr = 8000
    x = (0.5 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    blob = wav_encode(x, sr)
    for cut in (60, 100, 500):
        out = wav_decode(blob[:cut])
        if out is not None:
            dec, dsr = out
            assert dsr == sr
            assert dec.shape[1] <= (cut - 44) // 2 + 1
            assert np.isfinite(dec).all()


@pytest.mark.parametrize("force_python", [False, True])
def test_batcher_multi_consumer(force_python):
    """Two consumer threads racing over one queue: every id delivered exactly
    once, no crash (the native path previously had UB on a drained deque)."""
    b = Batcher(max_batch=2, max_wait_ms=5, force_python=force_python)
    got = []
    lock = threading.Lock()

    def consume():
        while True:
            ids, _ = b.next_batch(timeout_ms=100)
            if not ids:
                break
            with lock:
                got.extend(ids)

    consumers = [threading.Thread(target=consume) for _ in range(2)]
    for t in consumers:
        t.start()
    submitted = [b.submit(bucket=128, cost=1) for _ in range(40)]
    for t in consumers:
        t.join()
    assert sorted(got) == sorted(submitted)
    b.close()
