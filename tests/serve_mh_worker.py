"""Worker process for the real 2-process SERVING test (``test_parallel.py``).

Extends the dcn_worker pattern to the serving stack: each process owns 4
virtual CPU devices; process 0 runs a :class:`ServingEngine` over a
:class:`BroadcastSynthesizer` (``serve/multihost.py``) while process 1 runs
:func:`follower_serve` — requests enter on process 0, every sampler dispatch
shards its batch over the GLOBAL 8-device mesh, and both processes execute
the same SPMD programs in lockstep. The parent asserts: engine results match
a single-process mesh-less Synthesizer with the same params/seeds, and the
aggregated stats show both processes joined every dispatch.

Usage: python serve_mh_worker.py <coordinator_addr> <num_procs> <proc_id>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main() -> int:
    coord, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")  # axon pins platform at import

    from lemas_tts_tpu.parallel.distributed import initialize, make_global_mesh

    assert initialize(coord, num_procs, pid) is True
    assert jax.process_count() == num_procs and jax.process_index() == pid

    import jax.numpy as jnp
    import numpy as np

    from lemas_tts_tpu.config import DiTArch, MelSpecConfig, SamplerConfig
    from lemas_tts_tpu.infer.pipeline import Synthesizer
    from lemas_tts_tpu.models.dit import DiT
    from lemas_tts_tpu.models.vocos import Vocos
    from lemas_tts_tpu.serve.multihost import (
        BroadcastSynthesizer,
        MultiHostDispatch,
        follower_serve,
    )
    from lemas_tts_tpu.utils.vocab import Vocab

    mesh = make_global_mesh(model_parallel=1)  # ('data','model') = (8, 1)

    # identical init on every process (same keys → same params: the SPMD
    # contract; a real deployment loads the same checkpoint everywhere)
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

    synth = Synthesizer(dit, dparams, voc, vparams, vocab, mel_cfg, mesh=mesh)
    assert synth._multiproc is True
    dispatch = MultiHostDispatch(synth)
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0)

    def req(seed, text):
        rng = np.random.default_rng(seed)
        wav = (0.2 * rng.standard_normal(8000)).astype(np.float32)
        return dict(ref_wav=wav, ref_sr=8000, ref_units="abde ",
                    gen_units=text, seed=seed)

    if pid != 0:
        counters = follower_serve(dispatch)
        print(json.dumps({"pid": pid, "ok": True, **counters}))
        return 0

    # ---------------- process 0: engine + correctness reference ----------
    from lemas_tts_tpu.serve.engine import ServingEngine, TTSRequest

    proxy = BroadcastSynthesizer(dispatch)
    proxy.warmup(cfg, duration_buckets=(256,), text_buckets=(64,),
                 batch_buckets=(1,))
    engine = ServingEngine(proxy, cfg=cfg, max_batch=4, max_wait_ms=50)
    reqs = [req(11, "abc def"), req(12, "ghi"), req(13, "abc abc abc")]
    try:
        futures = [engine.submit(TTSRequest(**r)) for r in reqs]
        results = [f.result(timeout=600) for f in futures]
        # one more request WITHOUT a seed: the proxy must pin one before
        # broadcasting (otherwise follower noise diverges silently)
        extra = dict(req(0, "abc"), seed=None)
        wave_x, sr_x, _ = engine.submit(TTSRequest(**extra)).result(timeout=600)
        assert sr_x == 8000 and np.isfinite(wave_x).all() and wave_x.size > 0

        # ---- broadcast STREAMING (round 5, lifts the 501): consume a
        # multihost stream while interleaving a batched engine dispatch
        # between its mini-batches — the per-op broadcast keeps every
        # process on one global program order
        stream_chunks = ["abc def", "ghi", "jjj hh", "abc"]
        s_ref = req(17, "")
        got_stream = []
        gen = proxy.synthesize_stream(s_ref["ref_wav"], 8000, "abde ",
                                      stream_chunks, cfg=cfg, seed=17,
                                      chunk_batch=2)
        for i, (w, s) in enumerate(gen):
            got_stream.append((w, s))
            if i == 0:  # mid-stream batched dispatch must interleave cleanly
                w_m, _, _ = engine.submit(
                    TTSRequest(**req(18, "def"))).result(timeout=600)
                assert np.isfinite(w_m).all()
        assert len(got_stream) == len(stream_chunks)

        stats = dispatch.aggregated_stats()

        # correctness: multihost engine rows == single-process mesh-less run
        # (row-independent math; seeded per-row noise is batch-invariant).
        # Computed BEFORE releasing the followers: they idle in recv() while
        # this local (collective-free) run compiles, and both processes then
        # exit together — an early follower exit would time out the
        # jax.distributed shutdown barrier.
        local = Synthesizer(dit, dparams, voc, vparams, vocab, mel_cfg)
        expected = local.synthesize_requests(reqs, cfg=cfg)
        max_err = 0.0
        for (wave, sr, mel), (ew, esr, emel) in zip(results, expected):
            assert sr == esr == 8000 and wave.shape == ew.shape, (
                wave.shape, ew.shape)
            np.testing.assert_allclose(wave, ew, atol=2e-4)
            np.testing.assert_allclose(mel, emel, atol=2e-4)
            max_err = max(max_err, float(np.max(np.abs(wave - ew))))

        # broadcast stream == single-process stream (same seed + grouping)
        exp_stream = list(local.synthesize_stream(
            s_ref["ref_wav"], 8000, "abde ", stream_chunks, cfg=cfg,
            seed=17, chunk_batch=2))
        assert len(exp_stream) == len(got_stream)
        for (gw, gs), (ew2, es2) in zip(got_stream, exp_stream):
            assert gs == es2 and gw.shape == ew2.shape
            np.testing.assert_allclose(gw, ew2, atol=2e-4)
            max_err = max(max_err, float(np.max(np.abs(gw - ew2))))

        assert stats["processes"] == num_procs
        assert stats["in_lockstep"], stats
        assert all(p["dispatches"] == dispatch.dispatches
                   for p in stats["per_process"]), stats
        assert all(p["warmups"] == 1 for p in stats["per_process"]), stats
    finally:
        engine.shutdown()
        dispatch.shutdown_followers()

    print(json.dumps({"pid": 0, "ok": True, "dispatches": dispatch.dispatches,
                      "warmups": dispatch.warmups, "max_err": max_err,
                      "stats": stats}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
