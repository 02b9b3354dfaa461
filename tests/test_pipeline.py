"""End-to-end synthesis engine tests (tiny random models, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lemas_tts_tpu.config import DiTArch, MelSpecConfig, SamplerConfig
from lemas_tts_tpu.infer.pipeline import (
    Synthesizer,
    chunk_text,
    cross_fade_concat,
)
from lemas_tts_tpu.models.dit import DiT
from lemas_tts_tpu.models.vocos import Vocos
from lemas_tts_tpu.utils.vocab import Vocab


def test_chunk_text_reference_semantics():
    text = "Hello world. This is a test! Short. " + "x" * 50 + ". End."
    chunks = chunk_text(text, max_chars=30)
    assert all(len(c.encode("utf-8")) <= 60 for c in chunks)
    assert "".join(chunks).replace(" ", "") == text.replace(" ", "")
    # Chinese punctuation split
    chunks = chunk_text("你好。世界很大。再见。", max_chars=8)
    assert len(chunks) >= 2


def test_cross_fade():
    a = np.ones(100, dtype=np.float32)
    b = np.zeros(100, dtype=np.float32)
    out = cross_fade_concat([a, b], sample_rate=100, cross_fade_duration=0.2)
    assert len(out) == 180
    # fade region strictly decreasing from 1 to 0
    fade = out[80:100]
    assert fade[0] <= 1.0 and fade[-1] >= 0.0 and (np.diff(fade) <= 0).all()
    assert np.array_equal(cross_fade_concat([a, b], 100, 0.0), np.concatenate([a, b]))


@pytest.fixture(scope="module")
def engine():
    mel_cfg = MelSpecConfig(n_mel_channels=20, n_fft=256, win_length=256,
                            hop_length=64, target_sample_rate=8000)
    arch = DiTArch(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2,
                   text_dim=32, conv_layers=1)
    vocab = Vocab(char_map={c: i for i, c in enumerate(" abcdefghij")}, size=11)
    dit = DiT(arch=arch, mel_dim=20, text_num_embeds=vocab.size)
    key = jax.random.key(0)
    dparams = dit.init(
        key, jnp.zeros((1, 32, 20)), jnp.zeros((1, 32, 20)),
        jnp.zeros((1, 8), jnp.int32), jnp.zeros((1,)),
    )
    voc = Vocos(input_channels=20, dim=32, intermediate_dim=64, num_layers=2,
                n_fft=256, hop_length=64)
    vparams = voc.init(key, jnp.zeros((1, 20, 16)))
    return Synthesizer(dit, dparams, voc, vparams, vocab, mel_cfg, max_duration=512)


def test_synthesize_chunks_end_to_end(engine):
    sr = 8000
    t = np.arange(sr) / sr
    ref = (0.2 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=2.0, sway_sampling_coef=1.0,
                        max_duration=512)
    wave, out_sr, mel = engine.synthesize_chunks(
        ref, sr, list("abba"), [list("abc"), list("fgh")], cfg, seed=0,
    )
    assert out_sr == sr
    assert wave.ndim == 1 and len(wave) > 0
    assert np.isfinite(wave).all() and np.abs(wave).max() <= 0.999
    assert mel.shape[0] == 20 and np.isfinite(mel).all()


def test_synthesis_deterministic_and_batch_invariant(engine):
    """Same seed → same audio; chunk results don't depend on batch makeup
    (the reference's per-sample re-seeding goal, cfm.py:428-435)."""
    sr = 8000
    ref = (0.2 * np.sin(2 * np.pi * 150 * np.arange(sr) / sr)).astype(np.float32)
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0, sway_sampling_coef=1.0,
                        max_duration=512)
    w1, _, _ = engine.synthesize_chunks(ref, sr, list("ab"), [list("abc")], cfg, seed=7)
    w2, _, _ = engine.synthesize_chunks(ref, sr, list("ab"), [list("abc")], cfg, seed=7)
    np.testing.assert_array_equal(w1, w2)
    # single chunk vs same chunk within a 2-chunk request: prefix identical
    w3, _, _ = engine.synthesize_chunks(
        ref, sr, list("ab"), [list("abc"), list("fg")], cfg, seed=7)
    assert len(w3) > len(w1)
    np.testing.assert_allclose(w3[: len(w1) // 2], w1[: len(w1) // 2], atol=1e-5)


def test_duplicate_test_diagnostic(engine):
    """duplicate_test starts the ODE at t_inter from a cond-duplicated state
    with proportionally fewer steps (reference cfm.py:221-222,439-443)."""
    sr = 8000
    ref = (0.2 * np.sin(2 * np.pi * 180 * np.arange(sr) / sr)).astype(np.float32)
    cfg = SamplerConfig(nfe_steps=4, cfg_strength=1.0, max_duration=512,
                        duplicate_test=True, t_inter=0.25)
    wave, out_sr, mel = engine.synthesize_chunks(
        ref, sr, list("ab"), [list("abc")], cfg, seed=3)
    assert out_sr == sr and wave.size > 0 and np.isfinite(wave).all()
    # differs from the normal path with the same seed
    w_norm, _, _ = engine.synthesize_chunks(
        ref, sr, list("ab"), [list("abc")],
        SamplerConfig(nfe_steps=4, cfg_strength=1.0, max_duration=512), seed=3)
    assert wave.shape != w_norm.shape or not np.allclose(wave, w_norm)


def test_no_ref_audio_and_ref_ratio_paths(engine):
    """no_ref_audio replaces cond with mean-matched noise and re-centers the
    generated region (cfm.py:320-324,464-467); ref_ratio<1 with GRL shuffles
    the conditioning mel (cfm.py:267-280). Both must synthesize finite audio
    that differs from the default path."""
    sr = 8000
    ref = (0.2 * np.sin(2 * np.pi * 170 * np.arange(sr) / sr)).astype(np.float32)
    base_cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0, max_duration=512)
    w0, _, _ = engine.synthesize_chunks(ref, sr, list("ab"), [list("abc")],
                                        base_cfg, seed=11)
    w1, _, _ = engine.synthesize_chunks(
        ref, sr, list("ab"), [list("abc")],
        SamplerConfig(nfe_steps=2, cfg_strength=1.0, max_duration=512,
                      no_ref_audio=True), seed=11)
    w2, _, _ = engine.synthesize_chunks(
        ref, sr, list("ab"), [list("abc")],
        SamplerConfig(nfe_steps=2, cfg_strength=1.0, max_duration=512,
                      use_acc_grl=True, ref_ratio=0.5), seed=11)
    for w in (w1, w2):
        assert w.size > 0 and np.isfinite(w).all()
    assert not np.array_equal(w0, w1)
    assert not np.array_equal(w0, w2)


def test_more_chunks_than_max_batch_bucket(engine):
    """>32 chunks previously crashed on mismatched batch dims; now processed
    in groups with identical per-chunk results (batch invariance)."""
    sr = 8000
    ref = (0.2 * np.sin(2 * np.pi * 190 * np.arange(sr) / sr)).astype(np.float32)
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0, max_duration=512,
                        cross_fade_duration=0.0)
    chunks = [list("ab"), list("cd")] * 17  # 34 chunks
    w, out_sr, mel = engine.synthesize_chunks(ref, sr, list("ab"), chunks,
                                              cfg, seed=5)
    assert out_sr == sr and np.isfinite(w).all()
    # per-chunk waves match a direct 2-chunk run (grouping is invisible)
    parts, _, _ = engine.synthesize_chunks(ref, sr, list("ab"), chunks, cfg,
                                           seed=5, return_parts=True)
    solo, _, _ = engine.synthesize_chunks(ref, sr, list("ab"),
                                          [list("ab"), list("cd")], cfg,
                                          seed=5, return_parts=True)
    assert len(parts) == 34
    np.testing.assert_allclose(parts[0], solo[0], atol=1e-5)
    np.testing.assert_allclose(parts[33], solo[1], atol=1e-5)


def test_empty_gen_chunks_returns_empty(engine):
    sr = 8000
    ref = (0.2 * np.sin(2 * np.pi * 150 * np.arange(sr) / sr)).astype(np.float32)
    cfg = SamplerConfig(nfe_steps=2, max_duration=512)
    wave, out_sr, mel = engine.synthesize_chunks(ref, sr, list("ab"), [], cfg)
    assert out_sr == sr and wave.size == 0 and mel.shape == (20, 0)


def test_mixed_unit_types_raise(engine):
    sr = 8000
    ref = (0.2 * np.sin(2 * np.pi * 150 * np.arange(sr) / sr)).astype(np.float32)
    cfg = SamplerConfig(nfe_steps=2, max_duration=512)
    with pytest.raises(TypeError, match="both"):
        engine.synthesize_chunks(ref, sr, list("ab"), ["abc"], cfg)
    with pytest.raises(TypeError, match="both"):
        engine.synthesize_requests(
            [dict(ref_wav=ref, ref_sr=sr, ref_units="ab",
                  gen_units=list("abc"), seed=0)], cfg)


def test_clip_and_shuffle_degenerate():
    from lemas_tts_tpu.infer.pipeline import clip_and_shuffle

    rng = np.random.default_rng(0)
    tiny = np.ones((1, 4), np.float32)
    assert clip_and_shuffle(tiny, 0.3, 90, rng).shape == (1, 4)
    two = np.stack([np.zeros(4), np.ones(4)]).astype(np.float32)
    out = clip_and_shuffle(two, 0.3, 90, rng)  # seg_len would be 0 → clamped
    assert out.shape == (2, 4) and np.isfinite(out).all()


def test_unseeded_requests_are_position_independent_random(engine):
    """seed=None must not fall back to the batch index (review finding):
    two identical unseeded submissions should differ, not be bit-equal."""
    sr = 8000
    ref = (0.2 * np.sin(2 * np.pi * 150 * np.arange(sr) / sr)).astype(np.float32)
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0, max_duration=512)
    req = dict(ref_wav=ref, ref_sr=sr, ref_units=list("ab"),
               gen_units=list("cdefg"), seed=None)
    (w1, _, _), = engine.synthesize_requests([dict(req)], cfg)
    (w2, _, _), = engine.synthesize_requests([dict(req)], cfg)
    assert w1.shape == w2.shape
    assert not np.array_equal(w1, w2)


def test_request_ref_longer_than_duration_cap(engine):
    """Reference audio longer than max_duration must yield a short, sane
    generated slice — not a negative slice vocoding the whole bucket."""
    sr = 8000
    # ref mel frames ≈ 3*sr/64 ≈ 375 > max_duration 256 below
    ref = (0.1 * np.sin(2 * np.pi * 150 * np.arange(3 * sr) / sr)).astype(np.float32)
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0, max_duration=256)
    (w, out_sr, mel), = engine.synthesize_requests(
        [dict(ref_wav=ref, ref_sr=sr, ref_units=list("ab"),
              gen_units=list("cd"), seed=0)], cfg)
    assert out_sr == sr
    # at most a handful of frames of audio, never a full bucket of garbage
    assert w.shape[-1] <= 16 * 64 and np.isfinite(w).all()
    assert mel.shape[1] >= 1


def test_block_cache_kwargs_gating(engine, caplog):
    """The serving block-cache default must degrade to the exact path (not
    crash) on non-DiT backbones — regression test for the MMDiT
    AttributeError on `dit_model.arch.depth` — and a dropped user-set spec
    must warn once (the speed knob never silently does nothing).
    Sequence-parallel meshes now compose (test_sequence_parallel)."""
    import logging

    from lemas_tts_tpu.models.mmdit import MMDiT

    cfg = SamplerConfig(nfe_steps=2, block_cache="1-2:2")
    # DiT: cache engages (depth-clamped spec)
    kw = engine._block_cache_kwargs(cfg)
    assert kw == {"block_cache_range": (1, 2), "block_cache_every": 2}
    # sequence-parallel mesh: cache flows through (static segmentation —
    # no collectives under lax.cond)
    from lemas_tts_tpu.parallel.sequence import make_seq_mesh

    smesh = make_seq_mesh(len(jax.devices()), seq_parallel=2)
    synth3 = Synthesizer(engine.dit_model, engine.dit_params, None, None,
                         engine.vocab, engine.mel_cfg, max_duration=512,
                         mesh=smesh)
    assert synth3._block_cache_kwargs(cfg) == kw
    # non-DiT backbone (no .arch / embed_inputs): disabled with ONE warning
    mmdit = MMDiT(dim=32, depth=2, heads=4, dim_head=8, mel_dim=20,
                  text_num_embeds=11)
    synth2 = Synthesizer(mmdit, engine.dit_params, None, None, engine.vocab,
                         engine.mel_cfg, max_duration=512)
    with caplog.at_level(logging.WARNING, "lemas_tts_tpu.infer.pipeline"):
        assert synth2._block_cache_kwargs(cfg) == {}
        assert synth2._block_cache_kwargs(cfg) == {}  # warns only once
    assert sum("block_cache" in r.message for r in caplog.records) == 1
    # non-euler method override: disabled via block_cache_fields
    assert engine._block_cache_kwargs(
        SamplerConfig(nfe_steps=2, block_cache="1-2:2",
                      ode_method="midpoint")) == {}
