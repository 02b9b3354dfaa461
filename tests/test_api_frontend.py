"""TTS facade + text frontend tests (tiny random models, CPU)."""

import os
import warnings
from pathlib import Path

import numpy as np
import pytest

from lemas_tts_tpu.api import LANGS, process_phone_list
from lemas_tts_tpu.text import TextNorm
from lemas_tts_tpu.text.pinyin import is_pinyin_syllable, split_syllable

DATA = Path(__file__).parent / "data"


# ------------------------------------------------------------------ frontend
def test_is_pinyin_syllable():
    assert is_pinyin_syllable("ni3")
    assert is_pinyin_syllable("zhong1")
    assert is_pinyin_syllable("lv4")
    assert is_pinyin_syllable("er5")
    assert not is_pinyin_syllable("HELLO")
    assert not is_pinyin_syllable("ni")  # tone digit required
    assert not is_pinyin_syllable("xq3")  # invalid final


def test_sil_type_reference_semantics():
    tn = TextNorm(dtype="char")
    # reference frontend.py:40-50 compares python round() (an int) against
    # fractional thresholds, so "#1" is unreachable: round<0.4 ⇒ "" else the
    # integer lands in [0.8,1.5) ⇒ "#2" etc. Faithful to the quirk.
    assert tn.sil_type(0.1) == ""
    assert tn.sil_type(0.5) == ""  # banker's round 0.5→0
    assert tn.sil_type(0.6) == "#2"
    assert tn.sil_type(1.0) == "#2"
    assert tn.sil_type(2.0) == "#3"
    assert tn.sil_type(3.2) == "#4"


def test_txt2pin_phns_format():
    tn = TextNorm(dtype="char")
    out = tn.txt2pin_phns("ni3 hao3 #1 shi4")
    parts = out.split("|")
    assert parts[0] == "(zh)"
    assert "n" in parts and "i3" in parts and "#1" in parts
    # word separators collapse (no |_|_| runs)
    assert "_|_" not in out


def test_text2phn_char_hash_is_not_a_pause():
    """Only exact #n captures are pause tokens — text that merely starts
    with '#' must split into chars, not one glued out-of-vocab token."""
    tn = TextNorm(dtype="char")
    out = tn.text2phn("#winning today", lang="en")
    parts = out.split("|")
    assert parts[0] == "(en)"
    assert "#" in parts and "w" in parts  # split to chars, incl. the '#'
    assert not any(len(p) > 1 and p.startswith("#") for p in parts)
    # a real pause marker still survives as one token
    out2 = tn.text2phn("hi #2 there", lang="en")
    assert "#2" in out2.split("|")


def test_text2phn_chinese_char_fallback():
    tn = TextNorm(dtype="char")
    out = tn.text2phn("你好。")
    assert out.startswith("(zh)|")
    assert "你" in out and "好" in out


def test_add_sil_and_get_prompt():
    tn = TextNorm(dtype="char")
    subs = [
        {"word": "hello", "start": 0.0, "end": 0.4},
        {"word": "world", "start": 1.4, "end": 1.9},
        {"word": "bye", "start": 3.0, "end": 3.4},  # 1.1 s gap → #2
    ]
    segs = tn.add_sil(subs, 1.3, 2.0, "WORLD", "(en)", "(fr)")
    flat = " ".join(t for _, t in segs)
    assert "WORLD" in flat and "#2" in flat
    langs = [l for l, _ in segs]
    assert "(fr)" in langs
    prompt = tn.get_prompt(subs, 0.0, 2.5, "(en)")
    assert prompt[0][0] == "(en)"
    assert "hello" in prompt[0][1]


def test_process_phone_list():
    parts = ["(en)", "h", "ə", "_", "(zh)", "n", "i3", "_", ",", "#1"]
    out = process_phone_list(parts, LANGS)
    assert out[0] == "(en)h"
    assert "(zh)n" in out and "(zh)i3" in out
    # the separator before punctuation is dropped, the mid-word one kept
    assert out == ["(en)h", "(en)ə", "_", "(zh)n", "(zh)i3", ",", "#1"]


def test_lang_detect_heuristic():
    tn = TextNorm(dtype="char")
    assert tn.detect_lang("the cat is on the mat") == "en"
    assert tn.detect_lang("el gato está en la casa") == "es"
    assert tn.detect_lang("你好世界") == "zh"
    assert tn.detect_lang("こんにちは") == "ja"


# ----------------------------------------------------------------------- API
@pytest.fixture(scope="module")
def tiny_tts(tmp_path_factory):
    from lemas_tts_tpu.api import TTS

    vocab_path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    tokens = [" "] + list("abcdefghijklmnopqrstuvwxyz") + [
        "(en)", "(zh)", "(es)", "_", ",", ".", "!", "?", "#1", "#2", "#3", "#4",
    ] + [f"(en){c}" for c in "abcdefghijklmnopqrstuvwxyz"]
    vocab_path.write_text("\n".join(tokens) + "\n")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return TTS(model=str(DATA / "tiny.yaml"), vocab_file=str(vocab_path),
                   device="cpu", frontend="phone")


def test_tts_infer_end_to_end(tiny_tts, tmp_path):
    sr = 8000
    t = np.arange(int(sr * 1.0)) / sr
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav_path = tmp_path / "ref.wav"
    from lemas_tts_tpu.utils.audio_io import write_wav

    write_wav(str(wav_path), ref, sr)

    out_wav = tmp_path / "out.wav"
    wave, out_sr, spec = tiny_tts.infer(
        ref_file=str(wav_path),
        ref_text="hello there",
        gen_text="general kenobi",
        nfe_step=2,
        cfg_strength=1.0,
        file_wave=str(out_wav),
        seed=7,
        show_info=lambda *a, **k: None,
    )
    assert out_sr == sr
    assert wave.size > 0 and np.isfinite(wave).all()
    assert spec.shape[0] == 20
    assert out_wav.exists()
    assert tiny_tts.seed == 7


def test_tts_infer_deterministic(tiny_tts, tmp_path):
    sr = 8000
    rng = np.random.default_rng(0)
    ref = (0.1 * rng.standard_normal(sr)).astype(np.float32)
    from lemas_tts_tpu.utils.audio_io import write_wav

    p = tmp_path / "r.wav"
    write_wav(str(p), ref, sr)
    kw = dict(ref_file=str(p), ref_text="abc def", gen_text="ghi jkl",
              nfe_step=2, cfg_strength=1.0, seed=3,
              show_info=lambda *a, **k: None)
    w1, _, _ = tiny_tts.infer(**kw)
    w2, _, _ = tiny_tts.infer(**kw)
    np.testing.assert_array_equal(w1, w2)


def test_tts_infer_multiline_and_separate_langs(tiny_tts, tmp_path):
    sr = 8000
    t = np.arange(sr) / sr
    ref = (0.2 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    from lemas_tts_tpu.utils.audio_io import write_wav

    p = tmp_path / "r.wav"
    write_wav(str(p), ref, sr)
    wave, out_sr, _ = tiny_tts.infer(
        ref_file=str(p), ref_text="abc", gen_text="hello\nworld",
        nfe_step=2, cfg_strength=0.0, separate_langs=True, seed=1,
        show_info=lambda *a, **k: None,
    )
    assert wave.size > 0 and out_sr == sr


def test_bundled_configs_load():
    """Both bundled YAML configs parse into valid typed configs
    (reference configs/multilingual_grl.yaml + multilingual_prosody.yaml)."""
    from lemas_tts_tpu.config import load_model_config

    cfg = load_model_config("multilingual")
    assert cfg.arch.dim == 1024 and cfg.arch.depth == 22
    assert cfg.mel_spec.target_sample_rate == 24000
    pros = load_model_config("multilingual_prosody")
    assert pros.use_prosody_encoder is True
    assert pros.arch.dim == cfg.arch.dim  # same arch, prosody flag differs


def test_tts_byte_vocab_fallback(tmp_path):
    """No vocab file → byte tokenizer: infer must route raw-string units
    (phone/char unit lists are unmappable by the byte tokenizer)."""
    import warnings

    import numpy as np

    from lemas_tts_tpu.api import TTS
    from lemas_tts_tpu.utils.audio_io import write_wav

    sr = 8000
    t = np.arange(sr) / sr
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    p = tmp_path / "ref.wav"
    write_wav(str(p), ref, sr)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tts = TTS(model=str(DATA / "tiny.yaml"), device="cpu")
    assert tts.vocab.char_map is None  # byte tokenizer active
    assert tts.prepare_units("hello") == "hello"
    w, out_sr, _ = tts.infer(str(p), "abc def", "hello world",
                             nfe_step=2, cfg_strength=1.0, seed=4,
                             separate_langs=True,
                             show_info=lambda *a, **k: None)
    assert w.size > 0 and np.isfinite(w).all() and out_sr == sr
