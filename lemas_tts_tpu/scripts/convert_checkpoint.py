"""Checkpoint conversion CLI: reference torch formats → native orbax.

One-time conversion so production serving never needs torch at load time
(SURVEY.md §5 checkpoint/resume: "one-time PyTorch→JAX weight converter
(incl. EMA remap) + orbax-style native checkpoints"):

  python -m lemas_tts_tpu.scripts.convert_checkpoint \
      --ckpt model_last.safetensors --out ckpts/native_model [--use_ema]
  python -m lemas_tts_tpu.scripts.convert_checkpoint \
      --vocos pretrained/vocos-mel-24khz --out ckpts/vocos_native
  python -m lemas_tts_tpu.scripts.convert_checkpoint \
      --bigvgan bigvgan_generator.pt --out ckpts/bigvgan_native
  python -m lemas_tts_tpu.scripts.convert_checkpoint \
      --uvr5 Kim_Vocal_1.onnx --out ckpts/uvr5_native

Reverse direction — migrate a native DiT tree (e.g. a distilled student)
back to the reference's torch layout (written with safetensors when
available, else torch.save):

  python -m lemas_tts_tpu.scripts.convert_checkpoint \
      --export_dit ckpts/distilled/stage_8 --out student.safetensors
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Convert reference checkpoints to native orbax.")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--ckpt", type=str, help="CFM/DiT .safetensors or .pt")
    g.add_argument("--vocos", type=str, help="vocos dir (pytorch_model.bin) or file")
    g.add_argument("--bigvgan", type=str, help="BigVGAN generator .pt/.bin")
    g.add_argument("--uvr5", type=str, help="MDX-Net .onnx or .ckpt")
    g.add_argument("--export_dit", type=str,
                   help="Native DiT param tree (orbax dir) → reference torch "
                        "state dict at --out (.safetensors or .pt).")
    p.add_argument("--out", type=str, required=True,
                   help="Output orbax directory (or torch file for --export_dit).")
    p.add_argument("--use_ema", action="store_true",
                   help="Take the EMA weights from the CFM checkpoint.")
    p.add_argument("--prefix", type=str, default="transformer.",
                   help="Key prefix for --export_dit output (reference CFM "
                        "checkpoints nest the DiT under 'transformer.').")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from lemas_tts_tpu.infer.checkpoints import (
        load_cfm_checkpoint,
        load_state_dict,
        save_native,
    )

    for name in ("ckpt", "vocos", "bigvgan", "uvr5", "export_dit"):
        val = getattr(args, name)
        if val is not None and not val.strip():
            print(f"--{name} is empty", file=sys.stderr)
            return 2
    if args.export_dit is not None:
        from lemas_tts_tpu.infer.checkpoints import (
            export_dit_state_dict,
            load_native,
        )

        sd = export_dit_state_dict(
            load_native(str(Path(args.export_dit).resolve())), prefix=args.prefix
        )
        if args.out.endswith(".safetensors"):
            from safetensors.numpy import save_file

            save_file(sd, args.out)
        else:
            import torch

            torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, args.out)
        n = sum(v.size for v in sd.values())
        print(f"[convert] dit → torch layout: {n / 1e6:.2f}M params → {args.out}")
        return 0
    if args.ckpt is not None:
        params = load_cfm_checkpoint(args.ckpt, use_ema=args.use_ema)
        kind = "cfm"
    elif args.vocos is not None:
        from lemas_tts_tpu.models.vocos import convert_vocos

        p = Path(args.vocos)
        f = p / "pytorch_model.bin" if p.is_dir() else p
        params = {"params": convert_vocos(load_state_dict(str(f)))}
        kind = "vocos"
    elif args.bigvgan is not None:
        from lemas_tts_tpu.models.bigvgan import convert_bigvgan

        sd = load_state_dict(args.bigvgan)
        if any(k.startswith("generator.") for k in sd):
            sd = {k[len("generator."):]: v for k, v in sd.items()
                  if k.startswith("generator.")}
        params = {"params": convert_bigvgan(sd)}
        kind = "bigvgan"
    else:
        from lemas_tts_tpu.uvr5.mdxnet import (
            convert_convtdfnet,
            infer_config_from_state_dict,
        )

        if args.uvr5.endswith(".onnx"):
            from lemas_tts_tpu.uvr5.onnx_weights import load_onnx_initializers

            sd = load_onnx_initializers(args.uvr5)
        else:
            sd = load_state_dict(args.uvr5)
        cfg = infer_config_from_state_dict(sd)
        params = {"params": convert_convtdfnet(sd, cfg)}
        kind = f"uvr5 (derived config: {cfg})"

    save_native(params, str(Path(args.out).resolve()))
    import jax

    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"[convert] {kind}: {n / 1e6:.2f}M params → {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
