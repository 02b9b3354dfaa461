"""Minimal zero-shot TTS example.

With pretrained assets (see README "Quick start" for the expected layout under
``pretrained_models/``) this clones the reference voice; without assets it
runs the full pipeline on random weights — useful to validate an install.

    python examples/basic_tts.py [--ckpt ... --vocab ...]

(The reference repo's own ``infer/examples`` directory is absent from its
snapshot — its default vocab path pointed there, SURVEY.md §2.5.)
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
    p.add_argument("--ref", default="", help="reference wav (default: synthetic tone)")
    p.add_argument("--ref_text", default="some call me nature, others call me mother nature.")
    p.add_argument("--text", default="I've been a silent spectator, watching species evolve.")
    p.add_argument("--out", default="example_out.wav")
    p.add_argument("--nfe", type=int, default=32)
    args = p.parse_args()

    import lemas_tts_tpu
    from lemas_tts_tpu.utils.audio_io import write_wav

    ref = args.ref
    if not ref:
        sr = 24000
        t = np.arange(2 * sr) / sr
        wav = (0.3 * np.sin(2 * np.pi * 220 * t)
               * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
        ref = "example_ref.wav"
        write_wav(ref, wav, sr)
        print(f"[example] no --ref given; wrote a synthetic reference to {ref}")

    tts = lemas_tts_tpu.TTS(model=args.model, ckpt_file=args.ckpt, vocab_file=args.vocab)
    wave, out_sr, _ = tts.infer(
        ref_file=ref,
        ref_text=args.ref_text,
        gen_text=args.text,
        nfe_step=args.nfe,
        cfg_strength=5.0,
        sway_sampling_coef=3.0,
        separate_langs=True,
        file_wave=args.out,
    )
    print(f"[example] wrote {args.out}: {len(wave) / out_sr:.2f}s @ {out_sr} Hz "
          f"(seed {tts.seed})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
