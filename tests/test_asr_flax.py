"""Flax Whisper ASR backend (TPU-native alternative to the torch pipeline,
reference utils_infer.py:167-198): tiny random-init model, injected
components, full feature-extract -> generate -> decode path."""

import numpy as np
import pytest

@pytest.mark.slow
def test_flax_whisper_roundtrip():
    import pytest
    transformers = pytest.importorskip("transformers")
    from transformers import FlaxWhisperForConditionalGeneration, WhisperConfig, WhisperFeatureExtractor

    cfg = WhisperConfig(
        vocab_size=64, num_mel_bins=80, d_model=32,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=1500, max_target_positions=64,
        decoder_start_token_id=1, eos_token_id=2, pad_token_id=0,
        bos_token_id=1, max_length=8, suppress_tokens=[], begin_suppress_tokens=[],
        forced_decoder_ids=None,
    )
    model = FlaxWhisperForConditionalGeneration(cfg, seed=0)

    class FakeTok:
        def batch_decode(self, seqs, skip_special_tokens=True):
            return ["  hello world "]
    class FakeProc:
        feature_extractor = WhisperFeatureExtractor(feature_size=80)
        tokenizer = FakeTok()

    from lemas_tts_tpu.infer import asr
    wav = np.random.default_rng(0).uniform(-0.3, 0.3, 8000).astype(np.float32)
    text = asr.transcribe_flax(wav, 8000, model=model, processor=FakeProc())
    assert text == "hello world"
