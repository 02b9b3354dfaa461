"""Real-asset validation runbook (``scripts/validate_assets.py``).

The runbook's job is to work FIRST TRY on the first machine that has the
pretrained assets (zero-egress CI never does), so these tests pin its
machinery with tiny fixtures: the dry run prints every stand-alone command,
asset-less invocations skip (not fail) each gated step, and a tiny torch
checkpoint flows through convert → smoke-infer end-to-end.
"""

import json

import numpy as np
import pytest

from lemas_tts_tpu.scripts.validate_assets import STEPS, main


def test_dry_run_prints_full_runbook(capsys, tmp_path):
    rc = main(["--ckpt", "model.safetensors", "--vocab_file", "vocab.txt",
               "--vocos", "vocos_dir", "--uvr5", "kim.onnx",
               "--ref_repo", "/ref", "--manifest", "cases.json",
               "--out", str(tmp_path / "v"), "--dry_run"])
    out = capsys.readouterr().out
    assert rc == 0
    for step in STEPS:
        assert f"# {step}" in out
    assert "convert_checkpoint --ckpt model.safetensors" in out
    assert "parity_check --capture" in out
    assert "--pick_mse" in out


def test_no_assets_all_skip(capsys, tmp_path):
    """With nothing on disk every step skips with a reason and the chain
    exits 0 — missing assets are not failures."""
    rc = main(["--out", str(tmp_path / "v")])
    out = capsys.readouterr().out
    assert rc == 0
    recs = [json.loads(ln[len("[step] "):]) for ln in out.splitlines()
            if ln.startswith("[step] ")]
    assert {r["step"] for r in recs} == set(STEPS)
    assert all(r["status"] == "skip" and r["reason"] for r in recs)


def test_unknown_step_rejected(tmp_path):
    assert main(["--out", str(tmp_path), "--only", "bogus"]) == 2


def test_convert_and_smoke_end_to_end(capsys, tmp_path):
    """Tiny torch EMA checkpoint → convert_cfm → smoke_infer produce a
    non-silent wav, exactly the chain a real checkpoint takes."""
    torch = pytest.importorskip("torch")
    from tests.torch_ref.dit_torch import DiTRef

    from lemas_tts_tpu.utils.audio_io import write_wav

    vocab = tmp_path / "vocab.txt"
    tokens = [" "] + list("abcdefghijklmnopqrstuvwxyz.")
    vocab.write_text("\n".join(tokens) + "\n")
    tref = DiTRef(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2,
                  mel_dim=20, text_num_embeds=len(tokens), text_dim=32,
                  conv_layers=1)
    sd = {f"ema_model.transformer.{k}": v for k, v in tref.state_dict().items()}
    sd["ema_model.initted"] = torch.tensor(True)
    sd["ema_model.step"] = torch.tensor(1)
    ckpt = tmp_path / "ref.pt"
    torch.save(sd, str(ckpt))

    sr = 8000
    t = np.arange(int(0.6 * sr)) / sr
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    write_wav(str(tmp_path / "ref.wav"), ref, sr)

    out = tmp_path / "v"
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rc = main(["--ckpt", str(ckpt), "--use_ema",
                   "--vocab_file", str(vocab),
                   "--model", "tests/data/tiny.yaml",
                   "--ref_audio", str(tmp_path / "ref.wav"),
                   "--ref_text", "a reference.",
                   "--only", "convert_cfm,smoke_infer",
                   "--out", str(out)])
    outtxt = capsys.readouterr().out
    recs = {r["step"]: r for r in
            (json.loads(ln[len("[step] "):]) for ln in outtxt.splitlines()
             if ln.startswith("[step] "))}
    assert rc == 0, recs
    assert recs["convert_cfm"]["status"] == "pass"
    assert recs["smoke_infer"]["status"] == "pass"
    assert recs["smoke_infer"]["peak"] > 1e-4
    assert (out / "native_model").exists()
    assert (out / "smoke.wav").exists()
