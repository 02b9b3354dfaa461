from lemas_tts_tpu.eval.metrics import (
    cer,
    mcd,
    mel_mae,
    mel_mse,
    speaker_similarity,
    wer,
)

__all__ = ["mel_mse", "mel_mae", "mcd", "speaker_similarity", "wer", "cer"]
