"""Scenario tests mirroring BASELINE.json configs 1-5 at tiny scale.

1. single-sentence zero-shot TTS (CLI path, CPU-runnable)      → test_editing_cli
2. code-switch synthesis with CFG/sway sweep, batch 8          → here
3. multi-language batch with the prosody variant               → here (+ test_prosody_pipeline)
4. speech editing (prosody + non-prosody)                      → test_editing_cli
5. denoising + long-text chunked synthesis (serving path)      → here
"""

import warnings
from pathlib import Path

import numpy as np
import pytest

DATA = Path(__file__).parent / "data"


@pytest.fixture(scope="module")
def tts():
    from lemas_tts_tpu.api import TTS

    import tempfile

    d = tempfile.mkdtemp()
    vocab = Path(d) / "vocab.txt"
    tokens = [" "] + list("abcdefghijklmnopqrstuvwxyz") + [
        "(en)", "(zh)", "(es)", "(fr)", "(de)", "_", ",", ".", "!", "?",
        "#1", "#2", "#3", "#4",
    ]
    vocab.write_text("\n".join(tokens) + "\n")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return TTS(model=str(DATA / "tiny.yaml"), vocab_file=str(vocab),
                   device="cpu", frontend="phone")


def _ref(tmp_path, seed=0, seconds=1.0, sr=8000):
    from lemas_tts_tpu.utils.audio_io import write_wav

    rng = np.random.default_rng(seed)
    wav = (0.2 * rng.standard_normal(int(seconds * sr))).astype(np.float32)
    p = tmp_path / f"ref{seed}.wav"
    write_wav(str(p), wav, sr)
    return str(p)


@pytest.mark.slow
def test_config2_code_switch_cfg_sway_sweep(tts, tmp_path):
    """Code-switch text across a CFG-strength and sway sweep (config 2).
    Different guidance settings must produce different audio; every setting
    stays finite."""
    ref = _ref(tmp_path, 1)
    outs = {}
    for cfg_strength, sway in ((0.0, 1.0), (2.0, 1.0), (2.0, 3.0)):
        w, sr, _ = tts.infer(
            ref, "abc def", "hello 世界 world", nfe_step=2,
            cfg_strength=cfg_strength, sway_sampling_coef=sway,
            separate_langs=True, seed=7, show_info=lambda *a, **k: None,
        )
        assert np.isfinite(w).all()
        outs[(cfg_strength, sway)] = w
    a, b, c = outs.values()
    assert not np.array_equal(a, b)  # CFG changes output
    assert not np.array_equal(b, c)  # sway changes output


def test_config3_multilanguage_batch(tts, tmp_path):
    """Several languages through the frontend into one batched synthesis
    (config 3 shape; prosody-conditioned variant in test_prosody_pipeline)."""
    ref = _ref(tmp_path, 2)
    texts = ["hello world", "el gato es grande", "bonjour le monde",
             "hallo welt", "你好 世界"]
    w, sr, _ = tts.infer(ref, "abc", "\n".join(texts), nfe_step=2,
                         cfg_strength=1.0, separate_langs=True, seed=3,
                         show_info=lambda *a, **k: None)
    assert sr == 8000 and w.size > 0 and np.isfinite(w).all()


@pytest.mark.slow
def test_config5_longtext_chunked_with_denoise(tts, tmp_path):
    """Long-text chunked synthesis with cross-fade + UVR5 denoised reference
    (config 5, the serving path) — tiny separator stands in for real weights."""
    from lemas_tts_tpu.uvr5 import UVR5, MDXSeparator
    from lemas_tts_tpu.uvr5.mdxnet import MDXConfig

    ref = _ref(tmp_path, 4, seconds=1.0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sep = MDXSeparator.random_init(
            MDXConfig(dim_c=4, dim_f=24, dim_t=16, n_fft=64, hop=16,
                      num_blocks=5, l=2, g=4, k=3, bn=2, bias=False),
            batch_size=4,
        )
    den_path = UVR5(separator=sep).denoise_file(ref, str(tmp_path / "den.wav"))

    long_text = " ".join(["the quick brown fox jumps over the lazy dog."] * 4)
    w, sr, _ = tts.infer(den_path, "abc def", long_text, nfe_step=2,
                         cfg_strength=1.0, cross_fade_duration=0.05, seed=5,
                         show_info=lambda *a, **k: None)
    assert sr == 8000 and w.size > 0 and np.isfinite(w).all()
