"""Prosody-conditioned end-to-end synthesis (tiny models, CPU)."""

import warnings
from pathlib import Path

import numpy as np
import pytest

DATA = Path(__file__).parent / "data"


@pytest.fixture(scope="module")
def prosody_tts(tmp_path_factory):
    from lemas_tts_tpu.api import TTS

    vocab_path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    vocab_path.write_text(
        "\n".join([" "] + list("abcdefghijklmnopqrstuvwxyz")
                  + ["(en)", "_", ",", "."]) + "\n"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return TTS(model=str(DATA / "tiny.yaml"), vocab_file=str(vocab_path),
                   device="cpu", frontend="phone", use_prosody_encoder=True)


def test_prosody_conditioned_infer(prosody_tts, tmp_path):
    from lemas_tts_tpu.utils.audio_io import write_wav

    sr = 8000
    t = np.arange(sr) / sr
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    p = tmp_path / "ref.wav"
    write_wav(str(p), ref, sr)

    kw = dict(ref_file=str(p), ref_text="abc def", gen_text="hello world",
              nfe_step=2, cfg_strength=1.0, seed=9,
              show_info=lambda *a, **k: None)
    w_pros, sr_out, _ = prosody_tts.infer(use_prosody_encoder=True, **kw)
    w_nopros, _, _ = prosody_tts.infer(use_prosody_encoder=False, **kw)
    assert sr_out == sr
    assert w_pros.size > 0 and np.isfinite(w_pros).all()
    # prosody conditioning changes the output (same seed otherwise)
    assert w_pros.shape != w_nopros.shape or not np.allclose(w_pros, w_nopros)


def test_prosody_embedding_is_input_dependent(prosody_tts):
    enc = prosody_tts.prosody_encoder
    rng = np.random.default_rng(0)
    e1 = enc.embed((0.1 * rng.standard_normal(16000)).astype(np.float32))
    t = np.arange(16000) / 16000
    e2 = enc.embed((0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))
    assert not np.allclose(e1, e2)
    # deterministic for the same input
    e1b = enc.embed(np.asarray(e1, dtype=np.float32) * 0 + 0.1)
    e1c = enc.embed(np.asarray(e1, dtype=np.float32) * 0 + 0.1)
    np.testing.assert_array_equal(e1b, e1c)
