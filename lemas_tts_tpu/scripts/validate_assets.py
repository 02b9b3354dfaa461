"""One-command real-asset validation runbook.

Everything quality-critical in this framework that zero-egress CI can NEVER
exercise — converting the reference's pretrained checkpoints
(``/root/reference/lemas_tts/infer/utils_infer.py:204-246`` load semantics),
mel parity against reference-produced outputs, the live espeak phone
contract (``text_norm/tokenizer.py:116-130``), and re-probing the two
serving-default approximations on real weights — is chained here so the
first machine that has the assets validates the whole stack first try:

    python -m lemas_tts_tpu.scripts.validate_assets \\
        --ckpt model_last.safetensors --vocab_file vocab.txt \\
        --vocos pretrained/vocos-mel-24khz \\
        --ref_repo /path/to/LEMAS-TTS --ref_audio prompts/en_24k.wav \\
        --out validated/

Steps (each prints a ``[step]`` JSON line; ``--only``/``--skip`` select,
``--dry_run`` prints the equivalent stand-alone commands without running):

1. ``convert_cfm``       torch CFM/DiT ckpt → orbax ``<out>/native_model``
2. ``convert_vocoder``   Vocos/BigVGAN weights → orbax ``<out>/vocos_native``
3. ``convert_uvr5``      MDX-Net .onnx → orbax ``<out>/uvr5_native``
4. ``smoke_infer``       one short ``TTS.infer`` on the converted assets →
                         finite non-silent wave at ``<out>/smoke.wav``
5. ``parity_capture``    reference-side mel capture (needs torch + the
                         reference repo importable) → ``<out>/ref_bundle``
6. ``parity_compare``    replay the bundle through this framework; gate
                         mel MSE < ``--threshold`` (north-star 1e-3)
7. ``phone_goldens``     capture phone goldens from the REAL espeak backend
                         → ``<out>/phone_goldens.json`` (copy over
                         ``tests/data/phone_goldens.json`` to pin CI on it)
8. ``reprobe_cutoff``    re-measure ``SERVING_CFG_CUTOFF`` on the converted
                         weights; FAIL if its mel MSE breaches the bar
9. ``reprobe_blockcache``re-measure ``SERVING_BLOCK_CACHE`` (+ fallback
                         grid with ``--pick_mse``) on the converted weights
10. ``reprobe_quant``    re-measure ``SERVING_QUANT`` int8-vs-bf16
                         trajectory divergence on the converted weights

Skips are not failures: a step whose inputs/deps are absent reports
``skip`` with the reason and the chain continues. Exit code is non-zero
iff any step that RAN failed. Every step is an existing, individually
tested CLI — this module only sequences them and checks their outputs
(see ``docs/migration.md`` "Validating real assets").
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import time
from contextlib import redirect_stdout
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, List, Optional

STEPS = ("convert_cfm", "convert_vocoder", "convert_uvr5", "smoke_infer",
         "parity_capture", "parity_compare", "phone_goldens",
         "reprobe_cutoff", "reprobe_blockcache", "reprobe_quant")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Validate real pretrained assets end-to-end.")
    p.add_argument("--ckpt", type=str, default="",
                   help="reference CFM/DiT .safetensors or .pt")
    p.add_argument("--vocab_file", type=str, default="")
    p.add_argument("--vocos", type=str, default="",
                   help="vocos dir (pytorch_model.bin) or file")
    p.add_argument("--bigvgan", type=str, default="",
                   help="BigVGAN generator .pt/.bin (instead of --vocos)")
    p.add_argument("--uvr5", type=str, default="",
                   help="MDX-Net .onnx (optional denoiser)")
    p.add_argument("--model", type=str, default="multilingual",
                   help="model config name or YAML path (api.TTS)")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--ref_repo", type=str, default="",
                   help="reference LEMAS-TTS repo for parity capture")
    p.add_argument("--ref_audio", type=str, default="",
                   help="24 kHz mono reference prompt for smoke/parity")
    p.add_argument("--ref_text", type=str,
                   default="This is the reference prompt.",
                   help="transcript of --ref_audio (passing the real one "
                        "improves the smoke check; empty ⇒ Whisper ASR, "
                        "which needs egress)")
    p.add_argument("--bundle", type=str, default="",
                   help="existing reference bundle (skip parity_capture)")
    p.add_argument("--manifest", type=str, default="",
                   help="case manifest for parity_capture")
    p.add_argument("--threshold", type=float, default=1e-3,
                   help="parity + serving-default mel-MSE bar")
    p.add_argument("--pick_mse", type=float, default=1e-4,
                   help="block-cache re-probe calibration budget")
    p.add_argument("--probe_args", type=str, default="",
                   help="extra args appended to both reprobe CLIs (e.g. "
                        "'--dim 64 --depth 2 --heads 4 --mel_dim 20 "
                        "--vocab 28 --n 64 --batch 2' for a non-flagship "
                        "checkpoint; the full-chain drill uses this)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--only", type=str, default="",
                   help=f"comma list from {','.join(STEPS)}")
    p.add_argument("--skip", type=str, default="")
    p.add_argument("--dry_run", action="store_true",
                   help="print the equivalent stand-alone commands only")
    return p


@dataclass
class Step:
    name: str
    argv: Optional[List[str]]      # `python -m lemas_tts_tpu.scripts.<mod> …`
    skip_reason: Optional[str]     # set ⇒ report skip, don't run
    run: Optional[Callable[[], Dict]] = None  # extra validation, ran after
    note: str = ""
    module: str = ""
    # path that must exist at EXECUTION time (produced by an earlier step in
    # the same invocation — e.g. the reprobes target <out>/native_model from
    # convert_cfm); missing ⇒ skip with that reason instead of a confusing
    # FAIL when the producing step failed or was deselected via --only/--skip
    requires: Optional[str] = None


def _exists(path: str) -> bool:
    return bool(path) and Path(path).exists()


def _emit(rec: Dict) -> None:
    print("[step] " + json.dumps(rec), flush=True)


def _call_cli(module: str, argv: List[str]) -> str:
    """Run a scripts/ CLI in-process, capturing stdout (probe JSON lines).
    Raises on non-zero return."""
    import importlib

    mod = importlib.import_module(f"lemas_tts_tpu.scripts.{module}")
    buf = io.StringIO()

    class _Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.stderr.write(s)  # keep the operator's live view
            return len(s)

    with redirect_stdout(_Tee()):
        rc = mod.main(argv)
    if rc not in (None, 0):
        raise RuntimeError(f"{module} exited {rc}")
    return buf.getvalue()


def build_steps(args) -> List[Step]:
    out = Path(args.out)
    native_model = str(out / "native_model")
    native_voc = str(out / ("bigvgan_native" if args.bigvgan else
                            "vocos_native"))
    steps: List[Step] = []

    # ---- 1-3 conversions ---------------------------------------------------
    steps.append(Step(
        "convert_cfm", module="convert_checkpoint",
        argv=["--ckpt", args.ckpt, "--out", native_model]
             + (["--use_ema"] if args.use_ema else []),
        skip_reason=None if _exists(args.ckpt) else "--ckpt not provided/found",
        note="expect: '[convert] cfm … → orbax' with a ~330M param count "
             "for the flagship model"))
    if args.bigvgan:
        voc_argv = ["--bigvgan", args.bigvgan, "--out", native_voc]
        voc_skip = None if _exists(args.bigvgan) else "--bigvgan not found"
    else:
        voc_argv = ["--vocos", args.vocos, "--out", native_voc]
        voc_skip = None if _exists(args.vocos) else "--vocos not provided/found"
    steps.append(Step("convert_vocoder", module="convert_checkpoint",
                      argv=voc_argv, skip_reason=voc_skip,
                      note="expect: vocoder param count + orbax dir"))
    steps.append(Step(
        "convert_uvr5", module="convert_checkpoint",
        argv=["--uvr5", args.uvr5, "--out", str(out / "uvr5_native")],
        skip_reason=None if _exists(args.uvr5) else "--uvr5 not provided",
        note="expect: '[convert] uvr5 (derived config: …)'"))

    # ---- 4 smoke infer -----------------------------------------------------
    def smoke() -> Dict:
        import numpy as np

        from lemas_tts_tpu.api import TTS
        from lemas_tts_tpu.utils.audio_io import write_wav

        # prefer the orbax artifact step 1 just wrote: the persisted
        # converted model on disk is then itself load-validated (falling
        # back to in-process conversion of --ckpt when convert_cfm was
        # skipped/failed)
        ckpt = native_model if Path(native_model).is_dir() else args.ckpt
        tts = TTS(model=args.model, ckpt_file=ckpt,
                  vocab_file=args.vocab_file, use_ema=args.use_ema,
                  vocoder_local_path=(args.vocos or args.bigvgan) or None)
        wave, sr, _ = tts.infer(args.ref_audio, args.ref_text,
                                "Hello from the runbook.", nfe_step=16,
                                seed=0)
        if wave.size == 0 or not np.isfinite(wave).all():
            raise RuntimeError("smoke infer produced empty/non-finite audio")
        peak = float(np.abs(wave).max())
        if peak < 1e-4:
            raise RuntimeError(f"smoke infer is silent (peak {peak:.1e}) — "
                               "checkpoint/vocoder mismatch?")
        write_wav(str(out / "smoke.wav"), wave.astype(np.float32), sr)
        return {"audio_s": round(wave.size / sr, 2), "peak": round(peak, 3),
                "loaded": ckpt}

    smoke_skip = None
    if not (_exists(args.ckpt) and _exists(args.vocab_file)):
        smoke_skip = "needs --ckpt and --vocab_file"
    elif not _exists(args.ref_audio):
        smoke_skip = "needs --ref_audio (no ASR in zero-egress envs either: " \
                     "pass ref text via a manifest for parity instead)"
    steps.append(Step("smoke_infer", argv=None, skip_reason=smoke_skip,
                      run=smoke,
                      note="expect: audible non-silent wave at <out>/smoke.wav "
                           "(listen to it!)"))

    # ---- 5-6 parity --------------------------------------------------------
    bundle = args.bundle or str(out / "ref_bundle")
    cap_skip = None
    if args.bundle:
        cap_skip = "using existing --bundle"
    elif not (_exists(args.ref_repo) and _exists(args.manifest)):
        cap_skip = "needs --ref_repo and --manifest (torch-side capture)"
    steps.append(Step(
        "parity_capture", module="parity_check",
        argv=["--capture", "--ref_repo", args.ref_repo,
              "--ckpt_file", args.ckpt, "--manifest", args.manifest,
              "--vocab_file", args.vocab_file, "--model", args.model,
              "--out", bundle]
             + (["--use_ema"] if args.use_ema else []),
        skip_reason=cap_skip,
        note="expect: <bundle>/captured.json + one .mel.npy/.noise.npy per "
             "case"))
    steps.append(Step(
        "parity_compare", module="parity_check",
        argv=["--bundle", bundle, "--ckpt_file", args.ckpt,
              "--vocab_file", args.vocab_file, "--model", args.model,
              "--threshold", str(args.threshold),
              "--out", str(out / "parity_report.json")]
             + (["--use_ema"] if args.use_ema else [])
             + (["--vocoder_local_path", args.vocos] if args.vocos else []),
        skip_reason=None if (_exists(bundle) or cap_skip is None)
        else "no bundle (parity_capture skipped)",
        note=f"expect: per-language mel MSE < {args.threshold:g} "
             "(BASELINE north star); report at <out>/parity_report.json"))

    # ---- 7 phone goldens ---------------------------------------------------
    from lemas_tts_tpu.text import tokenizer as tok

    steps.append(Step(
        "phone_goldens", module="capture_phone_goldens",
        argv=["--out", str(out / "phone_goldens.json")]
             + (["--vocab_file", args.vocab_file] if args.vocab_file else []),
        skip_reason=None if tok.available() else "espeak-ng unavailable",
        note="expect: backend 'espeak' in the JSON; copy over "
             "tests/data/phone_goldens.json so CI pins the REAL contract, "
             "then run pytest tests/test_phone_goldens.py"))

    # ---- 8-9 serving-default re-probes -------------------------------------
    from lemas_tts_tpu.config import SERVING_BLOCK_CACHE, SERVING_CFG_CUTOFF

    def check_cutoff(stdout: str) -> Dict:
        recs = [json.loads(ln) for ln in stdout.splitlines()
                if ln.startswith("{")]
        mine = [r for r in recs
                if r.get("cutoff") == SERVING_CFG_CUTOFF and "mel_mse" in r]
        if not mine:
            raise RuntimeError("probe emitted no record for the serving "
                               f"default cutoff {SERVING_CFG_CUTOFF}")
        mse = mine[0]["mel_mse"]
        if mse > args.threshold:
            raise RuntimeError(
                f"SERVING_CFG_CUTOFF={SERVING_CFG_CUTOFF} diverges "
                f"{mse:.2e} mel MSE on real weights (> {args.threshold:g}) "
                "— lower the default in config.py")
        return {"mel_mse": mse}

    probe_skip = (None if _exists(args.ckpt) else "needs --ckpt "
                  "(random-weight probes already run in CI/bench)")
    probe_extra = args.probe_args.split() if args.probe_args else []
    steps.append(Step(
        "reprobe_cutoff", module="cutoff_probe",
        argv=["--ckpt", native_model, "--cutoffs", str(SERVING_CFG_CUTOFF)]
             + probe_extra,
        skip_reason=probe_skip, run=check_cutoff, requires=native_model,
        note="expect: serving-default cutoff mel MSE well under the bar "
             "on REAL weights (random-weight figure: 1.5e-5)"))

    def check_cache(stdout: str) -> Dict:
        recs = [json.loads(ln) for ln in stdout.splitlines()
                if ln.startswith("{")]
        mine = [r for r in recs if r.get("spec") == SERVING_BLOCK_CACHE]
        if not mine or "mel_mse" not in mine[0]:
            raise RuntimeError("probe emitted no record for the serving "
                               f"default spec {SERVING_BLOCK_CACHE!r}")
        mse = mine[0]["mel_mse"]
        picked = [r.get("picked") for r in recs if "picked" in r]
        if mse > args.threshold:
            raise RuntimeError(
                f"SERVING_BLOCK_CACHE={SERVING_BLOCK_CACHE!r} diverges "
                f"{mse:.2e} mel MSE on real weights (> {args.threshold:g}) "
                f"— probe picked {picked[0] if picked else None!r} at the "
                f"{args.pick_mse:g} budget; update config.py")
        return {"mel_mse": mse, "picked": picked[0] if picked else None}

    steps.append(Step(
        "reprobe_blockcache", module="blockcache_probe",
        argv=["--ckpt", native_model, "--cfg_cutoff", str(SERVING_CFG_CUTOFF),
              "--specs", ",".join(dict.fromkeys(
                  [SERVING_BLOCK_CACHE, "2-20:2", "2-14:2"])),
              "--pick_mse", str(args.pick_mse)] + probe_extra,
        skip_reason=probe_skip, run=check_cache, requires=native_model,
        note="expect: serving-default spec within the bar on REAL weights "
             "(random-weight figure: 1.7e-4); 'picked' names the fastest "
             "spec inside the --pick_mse budget. After ALL reprobes pass, "
             "update config.SERVING_DEFAULTS_EVIDENCE to calibration="
             "'real-weights:<ckpt-id>' with the probe date — CI pins the "
             "stamp to the live defaults and bench.py reports it"))

    def check_quant(stdout: str) -> Dict:
        recs = [json.loads(ln) for ln in stdout.splitlines()
                if ln.startswith("{")]
        serving = [r for r in recs if r.get("mode") == "serving"]
        if not serving:
            raise RuntimeError("quant probe emitted no serving-mode record")
        worst = max(r["mel_mse_int8_vs_bf16"] for r in serving)
        if worst > args.threshold:
            raise RuntimeError(
                f"SERVING_QUANT int8 diverges {worst:.2e} mel MSE from the "
                f"bf16 trajectory on real weights (> {args.threshold:g}) — "
                "set LEMAS_SERVING_QUANT='' / config.SERVING_QUANT=None")
        return {"mel_mse_int8_vs_bf16": worst}

    steps.append(Step(
        "reprobe_quant", module="quant_probe",
        argv=["--ckpt", native_model] + probe_extra,
        skip_reason=probe_skip, run=check_quant, requires=native_model,
        note="expect: int8-vs-bf16 trajectory divergence well under the "
             "bar on REAL weights (random-weight figure: 7.4e-6 at the "
             "serving approximations)"))
    return steps


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    only = {s for s in args.only.split(",") if s}
    skip = {s for s in args.skip.split(",") if s}
    unknown = (only | skip) - set(STEPS)
    if unknown:
        print(f"unknown steps: {sorted(unknown)} (choose from {STEPS})",
              file=sys.stderr)
        return 2
    Path(args.out).mkdir(parents=True, exist_ok=True)
    steps = build_steps(args)

    if args.dry_run:
        for st in steps:
            if st.argv is not None:
                print(f"# {st.name}: {st.note}")
                print("python -m lemas_tts_tpu.scripts." + st.module + " "
                      + " ".join(st.argv))
            else:
                print(f"# {st.name}: {st.note} (in-process TTS smoke)")
        return 0

    failed, summary = [], []
    for st in steps:
        if (only and st.name not in only) or st.name in skip:
            _emit({"step": st.name, "status": "skip", "reason": "deselected"})
            summary.append((st.name, "skip"))
            continue
        if st.skip_reason:
            _emit({"step": st.name, "status": "skip",
                   "reason": st.skip_reason})
            summary.append((st.name, "skip"))
            continue
        if st.requires and not Path(st.requires).exists():
            # execution-time dependency from an earlier step in this chain
            # (e.g. convert_cfm failed or was deselected) — a skip with the
            # real reason, not a confusing FAIL against a missing artifact
            _emit({"step": st.name, "status": "skip",
                   "reason": f"missing {st.requires} (producing step "
                             "failed or was deselected)"})
            summary.append((st.name, "skip"))
            continue
        t0 = time.perf_counter()
        try:
            stdout = _call_cli(st.module, st.argv) if st.argv is not None \
                else ""
            extra = {}
            if st.run is not None:
                extra = st.run(stdout) if st.argv is not None else st.run()
            _emit({"step": st.name, "status": "pass",
                   "time_s": round(time.perf_counter() - t0, 1), **extra})
            summary.append((st.name, "pass"))
        except Exception as e:  # noqa: BLE001 — runbook reports, then chains
            _emit({"step": st.name, "status": "FAIL", "error": str(e),
                   "time_s": round(time.perf_counter() - t0, 1)})
            summary.append((st.name, "FAIL"))
            failed.append(st.name)
    print(json.dumps({"summary": dict(summary), "failed": failed}))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
