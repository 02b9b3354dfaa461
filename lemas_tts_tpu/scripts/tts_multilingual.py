"""Zero-shot multilingual TTS CLI.

Flag-compatible with the reference CLI (``lemas_tts/scripts/tts_multilingual.py:169-361``),
plus TPU-specific knobs (``--attn_backend``, ``--compute_dtype``). The
canonical invocation mirrors ``tts_multilingual.sh:27-30``: NFE 64, CFG 5.0,
sway 3.0, ``--separate_langs``.
"""

from __future__ import annotations

import argparse
import random
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Zero-shot multilingual TTS (TPU-native).")
    # model / assets
    p.add_argument("--model", type=str, default="multilingual",
                   help="Model config name (bundled) or a YAML path.")
    p.add_argument("--ckpt_file", type=str, default="",
                   help="Checkpoint: .safetensors/.pt (converted) or a native orbax dir.")
    p.add_argument("--vocab_file", type=str, default="", help="Path to vocab.txt.")
    p.add_argument("--frontend", type=str, default="phone",
                   choices=["phone", "char", "none"], help="Text frontend type.")
    p.add_argument("--use_ema", action="store_true",
                   help="Use EMA weights from the checkpoint.")
    p.add_argument("--enable_prosody_encoder", action="store_true",
                   help="Enable prosody encoder if assets are available.")
    p.add_argument("--prosody_cfg_path", type=str, default="")
    p.add_argument("--prosody_ckpt_path", type=str, default="")
    p.add_argument("--vocoder_local_path", type=str, default=None)
    # inputs / outputs
    p.add_argument("--ref_audio", type=str, required=True, help="Reference audio file.")
    p.add_argument("--ref_text", type=str, required=True,
                   help="Reference transcript ('' → ASR).")
    p.add_argument("--text", type=str, required=True, help="Text to synthesize.")
    p.add_argument("--output_wave", type=str, default="output.wav")
    p.add_argument("--output_spec", type=str, default="",
                   help="Optional spectrogram PNG path.")
    p.add_argument("--denoise", action="store_true",
                   help="Apply UVR5 (MDX-Net) denoising to the reference audio.")
    p.add_argument("--uvr5_model", type=str, default="",
                   help="UVR5 MDX-Net weights (.onnx) for --denoise.")
    # sampling
    p.add_argument("--nfe_step", type=int, default=64, help="Number of sampling steps (NFE).")
    p.add_argument("--cfg_strength", type=float, default=5.0, help="CFG strength.")
    p.add_argument("--sway_sampling_coef", type=float, default=3.0)
    p.add_argument("--cfg_cutoff", type=float, default=None,
                   help="Skip the uncond CFG forward once "
                        "cfg_strength*(1-t)^2 < cutoff (speed/quality knob; "
                        "docs/performance.md).")
    p.add_argument("--block_cache", type=str, default=None,
                   help="Block-range residual cache 'lo-hi:every' (e.g. "
                        "'2-20:2'): skip recomputing those DiT blocks "
                        "between refresh steps (speed/quality knob; "
                        "docs/performance.md).")
    p.add_argument("--ode_method", type=str, default="euler",
                   choices=["euler", "midpoint"],
                   help="ODE solver: euler (reference parity) | midpoint "
                        "(2nd-order; better mel per velocity eval).")
    p.add_argument("--ref_ratio", type=float, default=1.0,
                   help="GRL conditioning clip ratio (<1 shuffles the ref mel).")
    p.add_argument("--no_ref_audio", action="store_true",
                   help="Disable reference audio conditioning.")
    p.add_argument("--separate_langs", action="store_true",
                   help="Apply language tags per token (for multilingual models).")
    p.add_argument("--speed", type=float, default=1.0)
    p.add_argument("--use_acc_grl", action="store_true",
                   help="Use accent GRL conditioning (if the model supports it).")
    p.add_argument("--fix_duration", type=float, default=None)
    p.add_argument("--seed", type=int, default=-1, help="-1 → random.")
    # device / perf (TPU-native)
    p.add_argument("--device", type=str, default=None,
                   help="jax platform: tpu | gpu | cpu (default: best available).")
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=[None, "bfloat16", "float32"])
    p.add_argument("--attn_backend", type=str, default=None,
                   choices=[None, "xla", "vmem", "splash"])
    return p


def build_tts(args):
    """Construct the TTS facade with a platform fallback (reference
    ``tts_multilingual.py:129-166,316-336`` cuda→cpu retry)."""
    from lemas_tts_tpu.api import TTS

    kwargs = dict(
        model=args.model,
        ckpt_file=args.ckpt_file,
        vocab_file=args.vocab_file,
        # getattr: other CLIs (speech_edit) reuse build_tts with their own parsers
        ode_method=getattr(args, "ode_method", "euler"),
        use_ema=args.use_ema,
        vocoder_local_path=args.vocoder_local_path,
        use_prosody_encoder=args.enable_prosody_encoder,
        prosody_cfg_path=args.prosody_cfg_path,
        prosody_ckpt_path=args.prosody_ckpt_path,
        frontend=None if args.frontend == "none" else args.frontend,
        compute_dtype=args.compute_dtype,
        attn_backend=args.attn_backend,
    )
    try:
        return TTS(device=args.device, **kwargs)
    except RuntimeError as e:
        if args.device not in (None, "cpu"):
            print(f"[tts] {args.device} unavailable ({e}); falling back to cpu",
                  file=sys.stderr)
            return TTS(device="cpu", **kwargs)
        raise


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    seed = args.seed if args.seed >= 0 else random.randint(0, 2**31 - 1)

    ref_audio = args.ref_audio
    if args.denoise:
        from pathlib import Path

        from lemas_tts_tpu.uvr5 import UVR5

        if not (args.uvr5_model and Path(args.uvr5_model).is_file()):
            # an explicit --denoise with no weights must not silently run a
            # random-init separator over the reference (garbage conditioning)
            print("[tts] --denoise requires --uvr5_model pointing at MDX "
                  "weights (.onnx/.ckpt); refusing to denoise with a "
                  "randomly initialized network", file=sys.stderr)
            return 2
        uvr = UVR5(model_path=args.uvr5_model)
        ref_audio = uvr.denoise_file(ref_audio)
        print(f"[tts] denoised reference → {ref_audio}")

    tts = build_tts(args)
    wav, sr, _spec = tts.infer(
        ref_file=ref_audio,
        ref_text=args.ref_text,
        gen_text=args.text,
        nfe_step=args.nfe_step,
        cfg_strength=args.cfg_strength,
        sway_sampling_coef=args.sway_sampling_coef,
        cfg_cutoff=args.cfg_cutoff,
        block_cache=args.block_cache,
        speed=args.speed,
        separate_langs=args.separate_langs,
        use_acc_grl=args.use_acc_grl,
        ref_ratio=args.ref_ratio,
        no_ref_audio=args.no_ref_audio,
        fix_duration=args.fix_duration,
        use_prosody_encoder=args.enable_prosody_encoder,
        seed=seed,
        file_wave=args.output_wave,
        file_spec=args.output_spec or None,
    )
    dur = len(wav) / sr
    print(f"[tts] wrote {args.output_wave}: {dur:.2f} s @ {sr} Hz (seed {seed})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
