"""Speech-editing engine + CLI entry-point tests (tiny models, CPU)."""

import json
import warnings
from pathlib import Path

import numpy as np
import pytest

from lemas_tts_tpu.infer.editing import build_edit_mask, parse_align_json

DATA = Path(__file__).parent / "data"


def test_build_edit_mask_frame_math():
    sr, hop = 8000, 64
    n = sr * 2  # 2 s → 250 frames
    # edit [0.5, 1.0] s with no margin
    mask = build_edit_mask([(0.5, 1.0)], n, sr, hop, margin=0.0)
    total = n // hop
    assert mask.shape[0] == total + 1
    f = sr // hop  # frames per second (125)
    # reference rounding: n_keep = round(0.5*sr/hop) = 62, n_edit = 62
    n_keep = round(0.5 * sr / hop)
    n_edit = round(0.5 * sr / hop)
    assert mask[:n_keep].all()
    assert not mask[n_keep : n_keep + n_edit].any()
    assert mask[n_keep + n_edit :].all()
    # margin widens the regenerated span
    m2 = build_edit_mask([(0.5, 1.0)], n, sr, hop, margin=0.1)
    assert m2.sum() < mask.sum()


def test_build_edit_mask_multi_span():
    sr, hop = 8000, 64
    n = sr * 3
    mask = build_edit_mask([(0.5, 1.0), (2.0, 2.5)], n, sr, hop, margin=0.0)
    f = sr // hop
    assert mask[0] and not mask[f // 2 + 1] and mask[int(1.5 * f)]
    assert not mask[int(2.2 * f)]
    assert mask[-1]


def test_parse_align_json(tmp_path):
    spec_dict = {
        "interval": [1.0, 4.0],
        "modified_index": [1, 2],
        "words": [
            {"word": "hello", "interval": [1.1, 1.6]},
            {"word": "world", "interval": [1.8, 2.4]},
            {"word": "bye", "interval": [2.6, 3.1]},
        ],
        "modified_text": ["world", "earth"],
        "display_text": "hello world bye",
    }
    p = tmp_path / "a.json"
    p.write_text(json.dumps(spec_dict))
    spec = parse_align_json(str(p))
    assert spec.target_text == "hello earth bye"
    (s, e), = spec.parts_to_edit
    # word [1.8, 2.4] − utt_start 1.0 ∓ 0.1 margin
    assert abs(s - 0.7) < 1e-9 and abs(e - 1.4) < 1e-9

    with pytest.raises(ValueError):
        parse_align_json({**spec_dict, "modified_index": [2, 2]})


@pytest.fixture(scope="module")
def tiny_tts(tmp_path_factory):
    from lemas_tts_tpu.api import TTS

    vocab_path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    tokens = [" "] + list("abcdefghijklmnopqrstuvwxyz") + [
        "(en)", "(zh)", "_", ",", ".", "!", "?", "#1", "#2", "#3", "#4",
    ]
    vocab_path.write_text("\n".join(tokens) + "\n")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return TTS(model=str(DATA / "tiny.yaml"), vocab_file=str(vocab_path),
                   device="cpu", frontend="phone")


def test_edit_speech_keeps_unedited_mel(tiny_tts):
    from lemas_tts_tpu.config import SamplerConfig
    from lemas_tts_tpu.infer.editing import edit_speech

    sr = 8000
    rng = np.random.default_rng(1)
    wav = (0.2 * rng.standard_normal(2 * sr)).astype(np.float32)

    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0, target_rms=0.0)
    out, out_sr, mel = edit_speech(
        tiny_tts.synth, wav, sr, list("abc def"), [(0.5, 1.0)], cfg=cfg,
        seed=5, margin=0.0,
    )
    assert out_sr == sr and out.size > 0 and np.isfinite(out).all()

    # kept frames are bit-exact vs the original mel (cfm.py:461 paste)
    orig_mel = tiny_tts.synth.ref_mel(wav)  # [frames, D]
    mel = mel.T  # [T, D]
    f = sr // tiny_tts.synth.mel_cfg.hop_length
    np.testing.assert_array_equal(mel[: f // 2], orig_mel[: f // 2])
    np.testing.assert_array_equal(mel[f + 1 : orig_mel.shape[0]],
                                  orig_mel[f + 1 :])
    # edited frames actually changed
    assert not np.array_equal(mel[f // 2 + 1 : f - 1],
                              orig_mel[f // 2 + 1 : f - 1])


def test_speech_edit_cli_end_to_end(tmp_path, monkeypatch):
    from lemas_tts_tpu.scripts import speech_edit_multilingual as cli
    from lemas_tts_tpu.utils.audio_io import write_wav

    sr = 8000
    rng = np.random.default_rng(2)
    wav = (0.2 * rng.standard_normal(3 * sr)).astype(np.float32)
    wav_dir = tmp_path / "wavs"; wav_dir.mkdir()
    align_dir = tmp_path / "align"; align_dir.mkdir()
    save_dir = tmp_path / "out"
    write_wav(str(wav_dir / "utt1.wav"), wav, sr)
    (align_dir / "utt1.json").write_text(json.dumps({
        "interval": [0.0, 3.0],
        "modified_index": [1, 2],
        "words": [
            {"word": "abc", "interval": [0.2, 0.8]},
            {"word": "def", "interval": [1.0, 1.6]},
            {"word": "ghi", "interval": [1.9, 2.5]},
        ],
        "modified_text": ["def", "xyz"],
        "display_text": "abc def ghi",
    }))

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join([" "] + list("abcdefghijklmnopqrstuvwxyz")
                               + ["(en)", "_", ",", "."]) + "\n")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rc = cli.main([
            "--wav_dir", str(wav_dir), "--align_dir", str(align_dir),
            "--save_dir", str(save_dir),
            "--model", str(DATA / "tiny.yaml"), "--vocab_file", str(vocab),
            "--device", "cpu", "--nfe_step", "2", "--cfg_strength", "1.0",
            "--seed", "3",
        ])
    assert rc == 0
    assert (save_dir / "utt1.wav").exists()


def test_tts_cli_end_to_end(tmp_path):
    from lemas_tts_tpu.scripts import tts_multilingual as cli
    from lemas_tts_tpu.utils.audio_io import write_wav

    sr = 8000
    t = np.arange(sr) / sr
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    write_wav(str(tmp_path / "ref.wav"), ref, sr)
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join([" "] + list("abcdefghijklmnopqrstuvwxyz")
                               + ["(en)", "_", ",", "."]) + "\n")
    out = tmp_path / "gen.wav"
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rc = cli.main([
            "--ref_audio", str(tmp_path / "ref.wav"), "--ref_text", "abc def",
            "--text", "hello world", "--output_wave", str(out),
            "--model", str(DATA / "tiny.yaml"), "--vocab_file", str(vocab),
            "--device", "cpu", "--nfe_step", "2", "--cfg_strength", "1.0",
            "--seed", "4",
        ])
    assert rc == 0 and out.exists()


def test_g2p_cli(tmp_path):
    import subprocess
    import sys

    src = tmp_path / "in.txt"
    src.write_text("hello world\nabc def\n")
    out = tmp_path / "out.txt"
    import os

    r = subprocess.run(
        [sys.executable, "-m", "lemas_tts_tpu.scripts.g2p",
         "--input", str(src), "--output", str(out), "--workers", "2"],
        capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": str(Path(__file__).parents[1]),
             "PYTHONWARNINGS": "ignore", "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr
    lines = out.read_text().splitlines()
    assert len(lines) == 2
    assert all("|" in l for l in lines)  # phone-string format


def test_list_checkpoints(tmp_path):
    from lemas_tts_tpu.scripts.inference_gradio import list_checkpoints

    (tmp_path / "projA").mkdir()
    (tmp_path / "projA" / "model_last.safetensors").write_text("x")
    (tmp_path / "projB").mkdir()  # empty → excluded
    found = list_checkpoints(str(tmp_path))
    assert list(found) == ["projA"]
    assert found["projA"][0].endswith("model_last.safetensors")


def test_edit_speech_overlong_utterance(tiny_tts):
    """Utterances beyond the largest duration bucket are truncated, not
    crashed (cond/keep-mask clamped to N)."""
    from lemas_tts_tpu.config import SamplerConfig
    from lemas_tts_tpu.infer.editing import edit_speech

    sr = 8000
    wav = (0.1 * np.random.default_rng(0).standard_normal(40 * sr)).astype(np.float32)
    out, out_sr, _ = edit_speech(
        tiny_tts.synth, wav, sr, list("abc"), [(1.0, 2.0)],
        cfg=SamplerConfig(nfe_steps=2, cfg_strength=1.0, max_duration=512),
        seed=1,
    )
    assert out_sr == sr and out.size > 0 and np.isfinite(out).all()
