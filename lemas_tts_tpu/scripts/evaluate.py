"""Objective evaluation CLI: score synthesized audio against references.

No reference equivalent (the reference ships zero tests/benchmarks,
SURVEY §4/§6); this closes the loop in-repo:

  python -m lemas_tts_tpu.scripts.evaluate --manifest eval.jsonl \
      --out results.json [--dtw] [--speaker_ckpt enc.npz] [--asr]

Manifest: JSONL, one utterance per line —
  {"ref": "ref.wav", "hyp": "synth.wav", "text": "optional transcript",
   "hyp_text": "optional pre-computed ASR of hyp"}
``ref``/``hyp`` may also point at ``.npy`` log-mel arrays ([T, D] or
[D, T]); wavs are mel-ized with the configured frontend. Reported:
mel MSE/MAE + MCD (DTW-aligned lengths with ``--dtw``), speaker cosine
(needs ``--speaker_ckpt``), WER/CER (needs transcripts; ``--asr``
transcribes hyp wavs through ``infer/asr.py`` when ``hyp_text`` is absent).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate synthesized speech.")
    p.add_argument("--manifest", type=str, required=True)
    p.add_argument("--out", type=str, default="", help="JSON summary path.")
    p.add_argument("--per_utt", type=str, default="",
                   help="Optional per-utterance JSONL path.")
    p.add_argument("--config", type=str, default="multilingual",
                   help="Model config supplying the mel frontend params.")
    p.add_argument("--dtw", action="store_true",
                   help="DTW-align frames for MCD (length-mismatched pairs).")
    p.add_argument("--n_coeffs", type=int, default=13)
    p.add_argument("--speaker_ckpt", type=str, default="",
                   help="SpeakerEncoder params (orbax tree) for speaker cosine.")
    p.add_argument("--asr", action="store_true",
                   help="Transcribe hyp wavs for WER/CER when hyp_text absent.")
    return p


def _load_mel(path: str, frontend, sr_expect: int):
    """wav or .npy → [T, D] log-mel (numpy)."""
    import numpy as np

    if path.endswith(".npy"):
        m = np.load(path)
        if m.ndim != 2:
            raise ValueError(f"{path}: expected 2-D mel, got {m.shape}")
        # accept either [T, D] or [D, T]: the mel axis is the one equal to
        # n_mel_channels (ambiguous squares pass through as [T, D])
        D = frontend.n_mel_channels
        if m.shape[0] == D and m.shape[1] != D:
            m = m.T
        return np.asarray(m, np.float32), None
    from lemas_tts_tpu.ops.resample import resample
    from lemas_tts_tpu.utils.audio_io import read_audio

    wav, sr = read_audio(path)
    if wav.ndim > 1:
        wav = wav.mean(axis=0)
    if sr != sr_expect:
        wav = np.asarray(resample(wav, sr, sr_expect))
    mel = np.asarray(frontend(wav[None]))[0].T  # [T, D]
    return mel.astype(np.float32), wav


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import numpy as np

    from lemas_tts_tpu.config import load_model_config
    from lemas_tts_tpu.eval.metrics import cer, mcd, mel_mae, mel_mse, wer
    from lemas_tts_tpu.ops.mel import MelFrontend

    cfg = load_model_config(args.config)
    ms = cfg.mel_spec
    frontend = MelFrontend(
        n_fft=ms.n_fft, hop_length=ms.hop_length, win_length=ms.win_length,
        n_mel_channels=ms.n_mel_channels,
        target_sample_rate=ms.target_sample_rate,
        mel_spec_type=ms.mel_spec_type,
    )

    spk = None
    if args.speaker_ckpt:
        from lemas_tts_tpu.eval.metrics import speaker_similarity
        from lemas_tts_tpu.infer.checkpoints import load_native
        from lemas_tts_tpu.models.speaker import SpeakerEncoder

        enc = SpeakerEncoder()
        spk_params = load_native(args.speaker_ckpt)
        spk = lambda a, b: speaker_similarity(enc, spk_params, a, b)

    rows = []
    with open(args.manifest, "r", encoding="utf-8") as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    if not rows:
        print("empty manifest", file=sys.stderr)
        return 2

    per_utt = []
    for rec in rows:
        ref_mel, _ = _load_mel(rec["ref"], frontend, ms.target_sample_rate)
        hyp_mel, hyp_wav = _load_mel(rec["hyp"], frontend, ms.target_sample_rate)
        t = min(len(ref_mel), len(hyp_mel))
        r = {
            "ref": rec["ref"],
            "hyp": rec["hyp"],
            "mel_mse": float(mel_mse(ref_mel[None, :t], hyp_mel[None, :t])),
            "mel_mae": float(mel_mae(ref_mel[None, :t], hyp_mel[None, :t])),
            "mcd_db": mcd(ref_mel, hyp_mel, n_coeffs=args.n_coeffs,
                          use_dtw=args.dtw),
        }
        if spk is not None:
            r["speaker_cos"] = spk(ref_mel, hyp_mel)
        text = rec.get("text")
        hyp_text = rec.get("hyp_text")
        if text is not None and hyp_text is None and args.asr and hyp_wav is not None:
            from lemas_tts_tpu.infer.asr import transcribe

            hyp_text = transcribe((hyp_wav, ms.target_sample_rate))
        if text is not None and hyp_text is not None:
            r["wer"] = wer(text, hyp_text)
            r["cer"] = cer(text, hyp_text)
        per_utt.append(r)

    keys = sorted({k for r in per_utt for k in r
                   if isinstance(r[k], (int, float))})
    summary = {
        "n_utterances": len(per_utt),
        **{k: float(np.mean([r[k] for r in per_utt if k in r])) for k in keys},
    }
    out = json.dumps(summary, sort_keys=True)
    print(out)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            f.write(out + "\n")
    if args.per_utt:
        with open(args.per_utt, "w", encoding="utf-8") as f:
            for r in per_utt:
                f.write(json.dumps(r, sort_keys=True) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
