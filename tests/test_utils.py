"""Vocab + mask builder semantics (reference model/utils.py:42-128)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from lemas_tts_tpu.utils import (
    lens_to_mask,
    mask_from_frac_lengths,
    load_vocab,
    get_tokenizer,
    text_to_ids,
    pad_text_batch,
)


def test_vocab_roundtrip(tmp_path):
    vf = tmp_path / "vocab.txt"
    vf.write_text(" \na\nb\n(en)\n#1\n", encoding="utf-8")
    vocab = load_vocab(vf)
    assert vocab.size == 5
    assert vocab.char_map[" "] == 0
    ids = text_to_ids(["a", "(en)", "zzz", "#1"], vocab)
    # unknown 'zzz' -> 0
    np.testing.assert_array_equal(ids, [1, 3, 0, 4])


def test_pad_text_batch_minus_one():
    a = np.array([1, 2, 3], dtype=np.int32)
    b = np.array([7], dtype=np.int32)
    out = pad_text_batch([a, b])
    np.testing.assert_array_equal(out, [[1, 2, 3], [7, -1, -1]])


def test_byte_tokenizer():
    vocab = get_tokenizer("", "byte")
    assert vocab.size == 256
    np.testing.assert_array_equal(text_to_ids("hi", vocab), [104, 105])


def test_lens_to_mask():
    m = lens_to_mask(jnp.array([2, 4]), length=5)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[True, True, False, False, False], [True, True, True, True, False]],
    )


def test_mask_from_frac_lengths_span_size():
    lens = jnp.array([100, 80])
    frac = jnp.array([0.5, 0.25])
    m = mask_from_frac_lengths(lens, frac, length=128, rng=jax.random.key(0))
    counts = np.asarray(m).sum(axis=1)
    np.testing.assert_array_equal(counts, [50, 20])
    # spans are contiguous
    for row in np.asarray(m):
        idx = np.flatnonzero(row)
        assert (np.diff(idx) == 1).all()


def test_sampler_call_flops_schedule():
    """utils/flops: the analytic FLOPs model must track the sampler's real
    step schedule — CFG truncation and block-cache skips reduce counted
    work, no-CFG halves it, and the magnitude matches the closed-form
    NFE × 2B × depth × (16·N·D² + 4·N²·D) block estimate."""
    import os

    from lemas_tts_tpu.cfm.sampler import SamplerSettings
    from lemas_tts_tpu.config import DiTArch
    from lemas_tts_tpu.utils.flops import device_peak_flops, sampler_call_flops

    arch = DiTArch()
    B, N = 8, 1024
    f0 = sampler_call_flops(arch, SamplerSettings(
        steps=32, cfg_strength=2.0, sway_sampling_coef=1.0), B, N)
    f_cut = sampler_call_flops(arch, SamplerSettings(
        steps=32, cfg_strength=2.0, sway_sampling_coef=1.0,
        cfg_cutoff=0.5), B, N)
    f_cache = sampler_call_flops(arch, SamplerSettings(
        steps=32, cfg_strength=2.0, sway_sampling_coef=1.0, cfg_cutoff=0.5,
        block_cache_range=(0, 22), block_cache_every=2,
        block_cache_warm_tail=2), B, N)
    assert f_cache < f_cut < f0
    f_nocfg = sampler_call_flops(arch, SamplerSettings(
        steps=32, cfg_strength=0.0, sway_sampling_coef=1.0), B, N)
    assert f_nocfg < 0.6 * f0
    D = arch.dim
    est = 32 * 2 * B * arch.depth * (16 * N * D**2 + 4 * N**2 * D)
    assert 0.95 * est < f0 < 1.15 * est
    # midpoint costs two evals per step
    f_mid = sampler_call_flops(arch, SamplerSettings(
        steps=16, cfg_strength=2.0, sway_sampling_coef=1.0,
        method="midpoint"), B, N)
    assert abs(f_mid - f0) / f0 < 0.02
    # peak override knob
    os.environ["LEMAS_BENCH_PEAK_TFLOPS"] = "100"
    try:
        assert device_peak_flops() == 100e12
    finally:
        del os.environ["LEMAS_BENCH_PEAK_TFLOPS"]


def test_serving_defaults_evidence_stamp_is_fresh():
    """The serving-default approximations carry an evidence stamp
    (config.SERVING_DEFAULTS_EVIDENCE): flipping SERVING_CFG_CUTOFF or
    SERVING_BLOCK_CACHE without re-probing (and updating the stamp) must
    fail CI — a default's error measurement always travels with the
    default. bench.py emits the calibration field with every headline."""
    import lemas_tts_tpu.config as C
    from lemas_tts_tpu.config import (
        SERVING_BLOCK_CACHE,
        SERVING_CFG_CUTOFF,
        SERVING_DEFAULTS_EVIDENCE as EV,
    )

    assert EV["cfg_cutoff"] == SERVING_CFG_CUTOFF
    assert EV["block_cache"] == SERVING_BLOCK_CACHE
    # SERVING_QUANT reads its env override at import time; the stamp pins
    # the shipped default, not a per-process override
    if "LEMAS_SERVING_QUANT" not in os.environ:
        assert C.SERVING_QUANT == EV["quant"]
    assert EV["calibration"].startswith(("random-weights", "real-weights"))
    assert EV["probe"] and EV["probed"]
