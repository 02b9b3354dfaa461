"""ASR hook: Whisper transcription for reference audio.

Mirrors the reference pipeline (``utils_infer.py:167-198``:
``openai/whisper-large-v3-turbo`` via transformers) as a lazily-initialized
host/accelerator component. The model id is overridable with
``LEMAS_ASR_MODEL`` (e.g. a local path in hermetic environments)."""

from __future__ import annotations

import os
from typing import Optional, Tuple, Union

import numpy as np

_asr_pipe = None

DEFAULT_MODEL = "openai/whisper-large-v3-turbo"


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


def transcribe(
    ref_audio: Union[str, Tuple[np.ndarray, int]],
    language: Optional[str] = None,
) -> str:
    """Transcribe a file path or an ``(wave, sr)`` pair
    (reference ``utils_infer.py:188-198``)."""
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
