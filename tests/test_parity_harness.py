"""Checkpoint parity harness (``scripts/parity_check.py``) — compare mode.

The harness's purpose is scoring this framework against reference-produced
mels once pretrained assets exist (capture mode needs the torch reference,
absent in CI). These tests pin the machinery with a self-consistency loop:
a bundle captured from a tiny random-init model must replay to ~zero MSE
(the pinned-noise/pinned-duration contract), and a perturbed bundle must
trip the gate.
"""

import json
import warnings
from pathlib import Path

import numpy as np
import pytest

DATA = Path(__file__).parent / "data"


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    from lemas_tts_tpu.api import TTS
    from lemas_tts_tpu.utils.audio_io import write_wav

    root = tmp_path_factory.mktemp("parity")
    vocab_path = root / "vocab.txt"
    tokens = [" "] + list("abcdefghijklmnopqrstuvwxyz")
    vocab_path.write_text("\n".join(tokens) + "\n")

    sr = 8000
    t = np.arange(int(sr * 0.8)) / sr
    ref = (0.25 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    wav_path = root / "ref.wav"
    write_wav(str(wav_path), ref, sr)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tts = TTS(model=str(DATA / "tiny.yaml"), vocab_file=str(vocab_path),
                  device="cpu", frontend=None)
    return tts, root, wav_path


def _make_bundle(tiny_env, bundle: Path) -> dict:
    """Synthesize one case with pinned noise/duration and store it as a
    pseudo-reference bundle (exactly what --capture writes)."""
    from lemas_tts_tpu.config import SamplerConfig

    tts, root, wav_path = tiny_env
    bundle.mkdir(exist_ok=True)
    ref_units = list("hello")
    gen_units = list("worldly")
    duration = 160
    rng = np.random.default_rng(3)
    noise = rng.standard_normal((duration, 20)).astype(np.float32)
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0, sway_sampling_coef=-1.0)
    _w, _sr, mel = tts.synth.synthesize_chunks(
        *_read(wav_path), ref_units, [gen_units], cfg=cfg,
        noise_override=noise, duration_override=[duration])
    np.save(bundle / "case0.mel.npy", mel.astype(np.float32))
    np.save(bundle / "case0.noise.npy", noise)
    captured = {"cases": [{
        "name": "case0", "lang": "en", "ref_audio": str(wav_path),
        "ref_units": ref_units, "gen_units": gen_units,
        "nfe": 2, "cfg_strength": 1.0, "sway": -1.0,
        "duration": duration, "mel": "case0.mel.npy",
        "noise": "case0.noise.npy",
    }]}
    (bundle / "captured.json").write_text(json.dumps(captured))
    return {"mel": mel, "root": root}


def _read(wav_path):
    from lemas_tts_tpu.utils.audio_io import read_audio

    wav, sr = read_audio(str(wav_path))
    if wav.ndim > 1:
        wav = wav.mean(axis=0)
    return wav, sr


def _run_compare(tiny_env, bundle: Path, out: Path):
    from lemas_tts_tpu.scripts.parity_check import main

    _tts, root, _wav = tiny_env
    return main([
        "--bundle", str(bundle),
        "--model", str(DATA / "tiny.yaml"),
        "--vocab_file", str(root / "vocab.txt"),
        "--device", "cpu",
        "--out", str(out),
    ])


def test_noise_and_duration_overrides_pin_the_sampler(tiny_env):
    """Same injected noise → identical mel; different noise → different."""
    from lemas_tts_tpu.config import SamplerConfig

    tts, _root, wav_path = tiny_env
    wav, sr = _read(wav_path)
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0)
    units, gen = list("abc"), [list("defg")]
    n1 = np.random.default_rng(1).standard_normal((128, 20)).astype(np.float32)
    n2 = np.random.default_rng(2).standard_normal((128, 20)).astype(np.float32)
    _, _, m_a = tts.synth.synthesize_chunks(
        wav, sr, units, gen, cfg=cfg, noise_override=n1,
        duration_override=[128])
    _, _, m_b = tts.synth.synthesize_chunks(
        wav, sr, units, gen, cfg=cfg, noise_override=n1,
        duration_override=[128])
    _, _, m_c = tts.synth.synthesize_chunks(
        wav, sr, units, gen, cfg=cfg, noise_override=n2,
        duration_override=[128])
    np.testing.assert_array_equal(m_a, m_b)
    assert np.abs(m_a - m_c).max() > 1e-3
    # pinned duration controls the generated-region length exactly:
    # gen frames = duration − ref_audio_len (utils_infer.py:545 slice)
    ref_audio_len = len(wav) // 64
    assert m_a.shape[1] == 128 - ref_audio_len

    with pytest.raises(ValueError, match="duration_override"):
        tts.synth.synthesize_chunks(wav, sr, units, gen, cfg=cfg,
                                    duration_override=[128, 130])


@pytest.mark.slow
def test_compare_self_consistency_passes_gate(tiny_env, tmp_path):
    bundle = tmp_path / "bundle"
    _make_bundle(tiny_env, bundle)
    out = tmp_path / "report.json"
    assert _run_compare(tiny_env, bundle, out) == 0
    report = json.loads(out.read_text())
    assert report["failed_langs"] == []
    # replay through a fresh TTS of the same config must be bit-faithful
    assert report["per_lang"]["en"]["mel_mse"] < 1e-9
    assert report["cases"][0]["frames_ours"] == report["cases"][0]["frames_ref"]


@pytest.mark.slow
def test_compare_flags_mismatch(tiny_env, tmp_path):
    bundle = tmp_path / "bundle"
    _make_bundle(tiny_env, bundle)
    mel = np.load(bundle / "case0.mel.npy")
    np.save(bundle / "case0.mel.npy", mel + 0.5)  # corrupt the reference
    out = tmp_path / "report.json"
    assert _run_compare(tiny_env, bundle, out) == 1
    report = json.loads(out.read_text())
    assert report["failed_langs"] == ["en"]
