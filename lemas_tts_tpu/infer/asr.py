"""ASR hook: Whisper transcription for reference audio.

Mirrors the reference pipeline (``utils_infer.py:167-198``:
``openai/whisper-large-v3-turbo`` via transformers) as a lazily-initialized
host/accelerator component. The model id is overridable with
``LEMAS_ASR_MODEL`` (e.g. a local path in hermetic environments).

Two backends:
 - ``torch`` (default): the transformers pipeline, as in the reference;
 - ``flax`` (``LEMAS_ASR_BACKEND=flax``): FlaxWhisper generating on the same
   TPU as synthesis — no torch in the serving image. Components are
   injectable for hermetic tests."""

from __future__ import annotations

import os
from typing import Optional, Tuple, Union

import numpy as np

_asr_pipe = None
_flax_asr = None

DEFAULT_MODEL = "openai/whisper-large-v3-turbo"
WHISPER_SR = 16000


def initialize_asr_pipeline(dtype=None):
    """Build (once) and return the transformers ASR pipeline."""
    global _asr_pipe
    if _asr_pipe is not None:
        return _asr_pipe
    import torch
    from transformers import pipeline

    if dtype is None:
        dtype = torch.float16 if torch.cuda.is_available() else torch.float32
    _asr_pipe = pipeline(
        "automatic-speech-recognition",
        model=os.environ.get("LEMAS_ASR_MODEL", DEFAULT_MODEL),
        torch_dtype=dtype,
        device="cuda" if torch.cuda.is_available() else "cpu",
    )
    return _asr_pipe


def initialize_asr_flax(model=None, processor=None):
    """Build (once) the Flax Whisper (model, processor) pair. Pass both to
    inject pre-built components (tests / pre-warmed serving)."""
    global _flax_asr
    if model is not None and processor is not None:
        return (model, processor)  # injected — don't pollute the cache
    if _flax_asr is not None:
        return _flax_asr
    from transformers import (  # optional heavyweight deps
        FlaxWhisperForConditionalGeneration,
        WhisperProcessor,
    )

    mid = os.environ.get("LEMAS_ASR_MODEL", DEFAULT_MODEL)
    model = FlaxWhisperForConditionalGeneration.from_pretrained(mid)
    processor = WhisperProcessor.from_pretrained(mid)
    _flax_asr = (model, processor)
    return _flax_asr


def transcribe_flax(
    wav: np.ndarray,
    sr: int,
    language: Optional[str] = None,
    model=None,
    processor=None,
) -> str:
    """TPU-side transcription: resample → log-mel features → greedy
    ``generate`` under jit. Same contract as :func:`transcribe`."""
    import jax.numpy as jnp

    model, processor = initialize_asr_flax(model, processor)
    wav = np.asarray(wav, dtype=np.float32)
    if wav.ndim == 2:
        wav = wav.mean(axis=0)
    if sr != WHISPER_SR:
        from lemas_tts_tpu.ops.resample import resample

        wav = np.asarray(resample(jnp.asarray(wav), sr, WHISPER_SR))
    feats = processor.feature_extractor(
        wav, sampling_rate=WHISPER_SR, return_tensors="np"
    )["input_features"]
    gen_kwargs = {}
    if language and hasattr(processor, "get_decoder_prompt_ids"):
        try:
            gen_kwargs["forced_decoder_ids"] = processor.get_decoder_prompt_ids(
                language=language, task="transcribe"
            )
        except Exception:
            pass
    out = model.generate(jnp.asarray(feats), **gen_kwargs)
    seqs = out.sequences if hasattr(out, "sequences") else out
    text = processor.tokenizer.batch_decode(
        np.asarray(seqs), skip_special_tokens=True
    )[0]
    return text.strip()


def transcribe(
    ref_audio: Union[str, Tuple[np.ndarray, int]],
    language: Optional[str] = None,
) -> str:
    """Transcribe a file path or an ``(wave, sr)`` pair
    (reference ``utils_infer.py:188-198``)."""
    if os.environ.get("LEMAS_ASR_BACKEND", "torch").lower() == "flax":
        if isinstance(ref_audio, (tuple, list)):
            wav, sr = ref_audio
        else:
            from lemas_tts_tpu.utils.audio_io import read_audio

            wav, sr = read_audio(ref_audio)
        return transcribe_flax(wav, sr, language=language)
    pipe = initialize_asr_pipeline()
    if isinstance(ref_audio, (tuple, list)):
        wav, sr = ref_audio
        inputs = {"array": np.asarray(wav, dtype=np.float32), "sampling_rate": sr}
    else:
        inputs = ref_audio
    result = pipe(
        inputs,
        chunk_length_s=30,
        batch_size=128,
        generate_kwargs=(
            {"task": "transcribe", "language": language}
            if language
            else {"task": "transcribe"}
        ),
        return_timestamps=False,
    )
    return result["text"].strip()
