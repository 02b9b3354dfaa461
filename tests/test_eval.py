"""Evaluation metrics (eval/metrics.py + scripts/evaluate.py).

No reference equivalent (SURVEY §4: the reference ships zero evaluation);
contract: metric math is correct against hand computations and known
invariances (MCD gain-invariance via coefficient-0 exclusion, DTW helping
misaligned pairs), and the CLI scores a manifest end-to-end offline.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from lemas_tts_tpu.eval.metrics import (
    _dct_matrix,
    _dtw_path,
    cer,
    mcd,
    mel_cepstra,
    mel_mae,
    mel_mse,
    speaker_similarity,
    wer,
)


def test_mel_mse_masked():
    a = np.zeros((2, 4, 3), np.float32)
    b = np.ones((2, 4, 3), np.float32)
    b[:, 2:] = 100.0  # outside mask
    assert abs(float(mel_mse(a, b, lengths=[2, 2])) - 1.0) < 1e-6
    assert abs(float(mel_mae(a, b, lengths=[2, 2])) - 1.0) < 1e-6
    # unmasked includes the large frames
    assert float(mel_mse(a, b)) > 100.0


def test_dct_orthonormal():
    m = _dct_matrix(16, 16)
    np.testing.assert_allclose(m @ m.T, np.eye(16), atol=1e-5)


def test_mcd_identity_and_gain_invariance():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((40, 20)).astype(np.float32)
    assert mcd(a, a) == 0.0
    # uniform log-gain lands entirely in coefficient 0, which MCD excludes
    assert mcd(a, a + 3.0) < 1e-4
    # a real perturbation registers
    assert mcd(a, a + rng.standard_normal(a.shape).astype(np.float32) * 0.1) > 0.1


def test_mcd_dtw_helps_misalignment():
    rng = np.random.default_rng(1)
    base = rng.standard_normal((60, 20)).astype(np.float32)
    shifted = np.concatenate([base[:1]] * 5 + [base], axis=0)  # 5-frame stall
    assert mcd(base, shifted, use_dtw=True) < mcd(base, shifted, use_dtw=False)


def test_dtw_path_identity():
    a = np.arange(12, dtype=np.float32).reshape(4, 3)
    path = _dtw_path(a, a)
    assert path == [(i, i) for i in range(4)]


def test_wer_cer_known_cases():
    assert wer("the cat sat", "the cat sat") == 0.0
    assert abs(wer("the cat sat", "the bat sat") - 1 / 3) < 1e-9
    assert wer("a b", "a b c") == 0.5  # one insertion / 2 ref words
    assert wer("", "") == 0.0
    assert cer("abc", "abc") == 0.0
    assert abs(cer("abcd", "abce") - 0.25) < 1e-9
    # case folding
    assert wer("Hello World", "hello world") == 0.0


def test_speaker_similarity_self_is_one():
    import jax

    from lemas_tts_tpu.models.speaker import SpeakerConfig, SpeakerEncoder

    enc = SpeakerEncoder(SpeakerConfig(channels=(16, 16, 16, 16, 48),
                                       embed_dim=8))
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((30, 80)).astype(np.float32)
    params = enc.init(jax.random.key(0), jnp.asarray(mel)[None])
    assert abs(speaker_similarity(enc, params, mel, mel) - 1.0) < 1e-5
    other = rng.standard_normal((30, 80)).astype(np.float32) * 2.0
    s = speaker_similarity(enc, params, mel, other)
    assert -1.0 <= s <= 1.0


def test_evaluate_cli_smoke(tmp_path):
    from lemas_tts_tpu.scripts.evaluate import main
    from lemas_tts_tpu.utils.audio_io import write_wav

    sr = 8000
    t = np.arange(sr) / sr
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    hyp = (0.3 * np.sin(2 * np.pi * 230 * t)).astype(np.float32)
    write_wav(str(tmp_path / "ref.wav"), ref, sr)
    write_wav(str(tmp_path / "hyp.wav"), hyp, sr)
    np.save(tmp_path / "mel.npy", np.zeros((40, 20), np.float32))

    man = tmp_path / "eval.jsonl"
    rows = [
        {"ref": str(tmp_path / "ref.wav"), "hyp": str(tmp_path / "hyp.wav"),
         "text": "hello there", "hyp_text": "hello here"},
        {"ref": str(tmp_path / "ref.wav"), "hyp": str(tmp_path / "ref.wav")},
        {"ref": str(tmp_path / "mel.npy"), "hyp": str(tmp_path / "mel.npy")},
    ]
    man.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    out = tmp_path / "summary.json"
    per = tmp_path / "per.jsonl"
    rc = main(["--manifest", str(man), "--out", str(out),
               "--per_utt", str(per), "--config",
               "tests/data/tiny.yaml", "--dtw"])
    assert rc == 0
    summary = json.loads(out.read_text())
    assert summary["n_utterances"] == 3
    assert "mel_mse" in summary and "mcd_db" in summary and "wer" in summary
    utts = [json.loads(l) for l in per.read_text().splitlines()]
    # identical pairs score exactly zero
    assert utts[1]["mel_mse"] == 0.0 and utts[1]["mcd_db"] == 0.0
    assert utts[2]["mel_mse"] == 0.0
    assert abs(utts[0]["wer"] - 0.5) < 1e-9


def test_spectral_distance_properties():
    """Waveform-gate metric (bench.py): zero for identical signals,
    scale-free-ish and monotone in perturbation size."""
    import numpy as np

    from lemas_tts_tpu.eval.metrics import spectral_distance

    rng = np.random.default_rng(0)
    a = rng.standard_normal((2, 8192)).astype(np.float32)
    sc0, lm0 = spectral_distance(a, a)
    assert float(sc0) == 0.0 and float(lm0) == 0.0
    small = a + 0.01 * rng.standard_normal(a.shape).astype(np.float32)
    large = a + 0.3 * rng.standard_normal(a.shape).astype(np.float32)
    sc_s, _ = spectral_distance(small, a)
    sc_l, _ = spectral_distance(large, a)
    assert 0 < float(sc_s) < float(sc_l)
    # 1-D input accepted
    sc1, _ = spectral_distance(a[0], a[0])
    assert float(sc1) == 0.0
