"""Inference orchestration: synthesis pipeline, speech editing, preprocessing,
checkpoint conversion/loading, ASR hook."""

from lemas_tts_tpu.infer.pipeline import (
    Synthesizer,
    chunk_text,
    cross_fade_concat,
)

__all__ = ["Synthesizer", "chunk_text", "cross_fade_concat"]


def __getattr__(name):  # lazy: editing/preprocess pull jax-heavy deps
    if name in ("edit_speech", "parse_align_json", "build_edit_mask"):
        from lemas_tts_tpu.infer import editing

        return getattr(editing, name)
    if name == "preprocess_ref_audio_text":
        from lemas_tts_tpu.infer.preprocess import preprocess_ref_audio_text

        return preprocess_ref_audio_text
    raise AttributeError(name)
