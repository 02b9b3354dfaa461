"""Mask-based speech editing example.

Regenerates a time span of an utterance while keeping every other frame
bit-exact (the keep-mask is first-class in the sampler — same kernel as TTS,
reference ``cfm.py:293-295,461``). Without pretrained assets this runs on
random weights to demonstrate the flow.

    python examples/speech_edit.py [--ckpt ... --vocab ...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="multilingual", help="config name or yaml path")
    p.add_argument("--ckpt", default="", help="CFM checkpoint (torch or orbax)")
    p.add_argument("--vocab", default="", help="vocab.txt")
    p.add_argument("--wav", default="", help="utterance to edit (default: synthetic)")
    p.add_argument("--text", default="the quick brown fox jumps over the lazy dog")
    p.add_argument("--edit_start", type=float, default=0.8, help="seconds")
    p.add_argument("--edit_end", type=float, default=1.4, help="seconds")
    p.add_argument("--out", default="example_edited.wav")
    p.add_argument("--nfe", type=int, default=32)
    args = p.parse_args()

    import lemas_tts_tpu
    from lemas_tts_tpu.config import SamplerConfig
    from lemas_tts_tpu.infer.editing import edit_speech
    from lemas_tts_tpu.scripts.speech_edit_multilingual import build_tokens_from_text
    from lemas_tts_tpu.utils.audio_io import read_audio, write_wav

    if args.wav:
        wav, sr = read_audio(args.wav)
        wav = wav.mean(axis=0) if wav.ndim == 2 else wav
    else:
        sr = 24000
        t = np.arange(2 * sr) / sr
        wav = (0.3 * np.sin(2 * np.pi * 220 * t)
               * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
        print("[example] no --wav given; using a synthetic 2 s utterance")

    tts = lemas_tts_tpu.TTS(model=args.model, ckpt_file=args.ckpt, vocab_file=args.vocab)
    tokens = build_tokens_from_text(tts, args.text)

    edited, out_sr, _mel = edit_speech(
        tts.synth, wav, sr, tokens,
        parts_to_edit=[(args.edit_start, args.edit_end)],
        cfg=SamplerConfig(nfe_steps=args.nfe),
        seed=0,
    )
    write_wav(args.out, edited, out_sr)
    print(f"[example] wrote {args.out}: {edited.shape[-1] / out_sr:.2f}s, "
          f"span {args.edit_start}-{args.edit_end}s regenerated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
