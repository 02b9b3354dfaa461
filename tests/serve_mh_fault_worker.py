"""Worker process for the 2-process serving FAULT-INJECTION test
(``test_parallel.py::test_two_process_serving_follower_death``).

Same stack as ``serve_mh_worker.py``, but the parent SIGKILLs the follower
mid-serve. Process 0 must then, within a bounded time (heartbeat_timeout):
raise on the in-flight/queued futures (engine poisoned), reject new submits,
and keep ``aggregated_stats`` answering from the heartbeat table — instead
of deadlocking in the dead fleet's collectives (VERDICT r4 item 2).

Usage: python serve_mh_fault_worker.py <coordinator_addr> <num_procs> <pid>
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("LEMAS_MH_HEARTBEAT_HOST", "127.0.0.1")


def main() -> int:
    coord, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")

    from lemas_tts_tpu.parallel.distributed import initialize, make_global_mesh

    assert initialize(coord, num_procs, pid) is True

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

    mesh = make_global_mesh(model_parallel=1)

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
    # tight fault-detection knobs for the test: follower death must surface
    # in seconds, the op watchdog backstops a silent wedge
    dispatch = MultiHostDispatch(synth, op_timeout=45.0,
                                 heartbeat_interval=0.2,
                                 heartbeat_timeout=3.0,
                                 stats_lock_timeout=1.0)
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0)

    def req(seed, text):
        rng = np.random.default_rng(seed)
        wav = (0.2 * rng.standard_normal(8000)).astype(np.float32)
        return dict(ref_wav=wav, ref_sr=8000, ref_units="abde ",
                    gen_units=text, seed=seed)

    if pid != 0:
        # the parent SIGKILLs this process mid-serve; a clean return means
        # the test lost the race and should be reported as such
        follower_serve(dispatch)
        print(json.dumps({"pid": pid, "ok": False,
                          "note": "follower exited cleanly (never killed)"}))
        return 0

    # ------------------------- process 0: engine + fault assertions ------
    from lemas_tts_tpu.serve.engine import ServingEngine, TTSRequest

    proxy = BroadcastSynthesizer(dispatch)
    proxy.warmup(cfg, duration_buckets=(256,), text_buckets=(64,),
                 batch_buckets=(1,))
    engine = ServingEngine(proxy, cfg=cfg, max_batch=4, max_wait_ms=20)
    dispatch.on_degraded.append(engine.poison)
    verdict = {"pid": 0, "ok": False}
    try:
        # 1. healthy fleet serves
        w, sr, _ = engine.submit(TTSRequest(**req(11, "abc def"))).result(
            timeout=240)
        assert sr == 8000 and np.isfinite(w).all()

        # 2. submit a doomed request, tell the parent to kill the follower
        doomed = engine.submit(TTSRequest(**req(12, "ghi jkl")))
        print("READY_KILL", flush=True)

        # 3. the doomed future must FAIL LOUDLY within bounded time — via
        # heartbeat→poison (in-flight) or the degraded fast-fail (queued) —
        # never deadlock
        t0 = time.monotonic()
        try:
            doomed.result(timeout=30)
            verdict["note"] = "doomed request unexpectedly succeeded"
            # possible if the dispatch raced ahead of the kill: retry once
            # so the test still exercises the degraded path
            doomed = engine.submit(TTSRequest(**req(13, "mno")))
            doomed.result(timeout=30)
            raise AssertionError("fleet never degraded after follower kill")
        except RuntimeError as e:
            verdict["doomed_error"] = str(e)
            verdict["doomed_latency_s"] = round(time.monotonic() - t0, 3)
        assert verdict["doomed_latency_s"] < 25, verdict

        # 4. degraded state is terminal and loud: new submits reject fast
        t0 = time.monotonic()
        try:
            engine.submit(TTSRequest(**req(14, "pqr")))
            raise AssertionError("submit accepted on a degraded fleet")
        except RuntimeError as e:
            assert "degraded" in str(e), e
        verdict["submit_reject_s"] = round(time.monotonic() - t0, 3)
        assert verdict["submit_reject_s"] < 5

        # 5. stats stay responsive and report the dead follower — no
        # collective is attempted on a degraded fleet
        t0 = time.monotonic()
        stats = dispatch.aggregated_stats()
        verdict["stats_latency_s"] = round(time.monotonic() - t0, 3)
        assert verdict["stats_latency_s"] < 5, verdict
        assert stats["degraded"], stats
        assert stats["in_lockstep"] is False
        assert stats["fleet"]["dead"], stats
        verdict["stats"] = {"degraded": stats["degraded"],
                            "dead": stats["fleet"]["dead"]}
        verdict["ok"] = True
    finally:
        print(json.dumps(verdict), flush=True)
        # the worker thread may be wedged in a dead fleet's collective and
        # jax.distributed's atexit barrier would hang on the dead peer —
        # exactly the state this test injects. Skip atexit; the parent only
        # needs the verdict line + exit code.
        os._exit(0 if verdict["ok"] else 1)


if __name__ == "__main__":
    sys.exit(main())
